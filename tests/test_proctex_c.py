"""Proc-tex C-source translator (ops/proctex_c) tests.

The reference ingests user shader C source from the scene XML and
recompiles at runtime (RenderDriverRTE_ProcTex.cpp:467-563); these tests
pin that the jax translation (1) reproduces the bundled shaders exactly,
(2) handles the control-flow subset, and (3) works end-to-end through the
statefile path with INLINE source that is NOT in the name-matched stdlib.
"""
from __future__ import annotations

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.ops import proctex as PT
from hydracore_tpu.ops.proctex_c import ProcTexCompileError, compile_proc_tex

REF = "/root/reference/hydra_app/tests"


def _rand_inputs(R=64, seed=0):
    rng = np.random.default_rng(seed)
    uv = jnp.asarray(rng.uniform(0, 1, (R, 2)).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    nrm = rng.normal(size=(R, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = jnp.asarray(nrm)
    args = jnp.asarray(rng.uniform(0, 1, (R, 8)).astype(np.float32))

    def sample2d(slot, st):
        return jnp.concatenate(
            [st, st[:, :1] * 0 + 0.5, jnp.ones((R, 1))], axis=1)

    return uv, pos, nrm, -nrm, args, sample2d


@pytest.mark.skipif(not os.path.exists(
    f"{REF}/test_aniso2/data/proctex_00001.c"), reason="no reference data")
def test_translated_falloff_matches_stdlib():
    src = open(f"{REF}/test_aniso2/data/proctex_00001.c").read()
    fn = compile_proc_tex(src, main="prtex1_main",
                          gen_args=[("color1", "float3", 0, 3),
                                    ("color2", "float3", 3, 3)])
    uv, pos, nrm, wo, args, s2d = _rand_inputs()
    out = fn(uv, pos, nrm, wo, args, s2d)
    ref = PT.falloff(uv, pos, nrm, wo, args, s2d)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(ref),
                               atol=1e-6)


@pytest.mark.skipif(not os.path.exists(
    f"{REF}/test_aniso2/data/proctex_00002.c"), reason="no reference data")
def test_translated_hexaplanar_matches_stdlib():
    src = open(f"{REF}/test_aniso2/data/proctex_00002.c").read()
    ga = [(n, "sampler2D", i, 1) for i, n in enumerate(
        ["texX1", "texY1", "texZ1", "texX2", "texY2", "texZ2"])]
    ga += [("blendSize", "float", 6, 1), ("mapScale", "float", 7, 1)]
    fn = compile_proc_tex(src, main="prtex2_main", gen_args=ga)
    uv, pos, nrm, wo, args, s2d = _rand_inputs(seed=3)
    args = args.at[:, 6].set(2.0).at[:, 7].set(1.5)
    out = fn(uv, pos, nrm, wo, args, s2d)
    ref = PT.hexaplanar(uv, pos, nrm, wo, args, s2d)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(ref),
                               atol=1e-5)


NOVEL_SRC = r"""
float prtex9_lum(float3 c) { return 0.2126f*c.x + 0.7152f*c.y + 0.0722f*c.z; }

float4 prtex9_main(const SurfaceInfo* sHit, float3 cA, float3 cB,
                   float freq, _PROCTEXTAILTAG_)
{
  const float3 p = readAttr_WorldPos(sHit);
  float s = 0.0f;
  for (int i = 0; i < 3; i++)
    s = s + sin(p.x*freq*(1.0f + i));
  float3 col = cB;
  if (s > 0.0f) { col = cA; } else { col = cB * 0.5f; }
  float w = clamp(prtex9_lum(col), 0.0f, 1.0f);
  if (w > 0.9f)
    return make_float4(1.0f, 1.0f, 1.0f, 1.0f);
  return make_float4(col.x, col.y, col.z, w);
}
"""


def test_novel_shader_control_flow():
    """for-loop, if/else with member assigns, early return, helper call."""
    fn = compile_proc_tex(NOVEL_SRC, main="prtex9_main",
                          gen_args=[("cA", "float3", 0, 3),
                                    ("cB", "float3", 3, 3),
                                    ("freq", "float", 6, 1)])
    uv, pos, nrm, wo, args, s2d = _rand_inputs(seed=7)
    out = np.asarray(fn(uv, pos, nrm, wo, args, s2d))

    p = np.asarray(pos)
    a = np.asarray(args)
    s = sum(np.sin(p[:, 0] * a[:, 6] * (1.0 + i)) for i in range(3))
    col = np.where(s[:, None] > 0.0, a[:, 0:3], a[:, 3:6] * 0.5)
    w = np.clip(col @ np.array([0.2126, 0.7152, 0.0722]), 0, 1)
    exp = np.concatenate([col, w[:, None]], axis=1)
    exp = np.where(w[:, None] > 0.9, 1.0, exp)
    np.testing.assert_allclose(out, exp.astype(np.float32), atol=1e-5)


def test_unsupported_source_raises():
    with pytest.raises(ProcTexCompileError):
        compile_proc_tex("float4 m(const SurfaceInfo* s){ while(1){} }",
                         main="m")


CONST_SRC = r"""
float4 prtex5_main(const SurfaceInfo* sHit, float3 tint, _PROCTEXTAILTAG_)
{
  // novel source: NOT a stdlib name; scales the diffuse by a constant
  float3 c = make_float3(0.25f, 0.5f, 1.0f);
  int k = 0;
  for (int i = 0; i < 4; i++) k = k + 1;
  if (k == 4) c = c * tint;
  return make_float4(c.x, c.y, c.z, 1.0f);
}
"""


def test_statefile_inline_source_end_to_end(tmp_path):
    """A statefile proc texture whose .c source is a NOVEL shader (no
    stdlib match) must compile through ops/proctex_c and modulate the
    bound material's diffuse — the reference's splice-and-recompile
    contract (RenderDriverRTE_ProcTex.cpp:467-563)."""
    src_dir = f"{REF}/test_42"
    if not os.path.exists(src_dir):
        pytest.skip("no reference data")
    lib = tmp_path / "lib"
    shutil.copytree(src_dir, lib)
    (lib / "data" / "proctex_custom.c").write_text(CONST_SRC)

    xml = (lib / "statex_00001.xml").read_text()
    decl = """  <texture id="90" name="customscale" type="proc">
    <code file="x.c" main="main" loc="data/proctex_custom.c">
      <generated>
        <arg id="0" type="float3" name="tint" size="1" wsize="3" woffset="0" />
        <return type="float4" />
        <call>prtex5_main(sHit, make_float3(stack[0], stack[1], stack[2]), _PROCTEXTAILTAG_)</call>
      </generated>
    </code>
  </texture>
</textures_lib>"""
    xml = xml.replace("</textures_lib>", decl)
    bind = """      <texture id="90" type="texref_proc">
        <arg id="0" type="float3" name="tint" size="1" val="1.0 0.5 1.0" />
      </texture>
      <color>0.5 0.0 0.0</color>"""
    xml = xml.replace('''  <material id="6" name="red" type="hydra_material">
    <diffuse brdf_type="lambert">
      <color>0.5 0.0 0.0</color>''',
                      '''  <material id="6" name="red" type="hydra_material">
    <diffuse brdf_type="lambert">
''' + bind)
    assert 'texref_proc' in xml, "statefile patch failed"
    (lib / "statex_00001.xml").write_text(xml)

    PT.clear_registry()
    from hydracore_tpu.bsdf.core import fetch_material
    from hydracore_tpu.scene.scene import load_scene

    scene = load_scene(str(lib), width=32, height=32)
    assert scene.settings.has_proc_tex
    assert PT.num_proc_tex() >= 1

    R = 8
    mat_id = jnp.full((R,), 6, jnp.int32)
    uv = jnp.full((R, 2), 0.3, jnp.float32)
    pos = jnp.zeros((R, 3), jnp.float32)
    nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (R, 1))
    p = fetch_material(scene, mat_id, uv, pos, nrm, wo=nrm)
    # diffuse = 0.5 red * (0.25,0.5,1.0)*tint(1,0.5,1) -> r = 0.5*0.25
    got = np.asarray(p.diff_color[0])
    np.testing.assert_allclose(got, [0.5 * 0.25, 0.0, 0.0], atol=1e-6)
    PT.clear_registry()
