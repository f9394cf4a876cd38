"""Probe Mosaic scalar primitives needed by the packet traversal kernel."""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def probe(name, kern, *args, scratch=None, out=(1, 128)):
    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out, jnp.float32),
            scratch_shapes=scratch or [],
        )
        r = np.asarray(jax.jit(f)(*args))
        print(f"OK   {name}: {r[0, :4]}")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:140]
        print(f"FAIL {name}: {type(e).__name__} {msg}")


x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
xi = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)


# 1. scalar read from VMEM with dynamic index
def k1(x_ref, o_ref):
    i = jnp.int32(3)
    v = x_ref[i, 5]  # dynamic scalar read from VMEM
    o_ref[:] = jnp.full((1, 128), v, jnp.float32)


probe("scalar read VMEM dyn idx", k1, x)


# 2. vector full-reduce -> scalar used in pl.ds
def k2(x_ref, o_ref):
    s = jnp.sum(x_ref[0:1, 0:8].astype(jnp.int32)) % 60
    o_ref[:] = x_ref[pl.ds(s, 1), :]


probe("reduce->scalar for pl.ds", k2, x)


# 3. vector extract with static index
def k3(x_ref, o_ref):
    row = jnp.sum(x_ref[:, 0:8], axis=1)  # (64,)
    v = row[3]
    o_ref[:] = jnp.full((1, 128), v, jnp.float32)


probe("vector extract static idx", k3, x)


# 4. int scalar read from int32 VMEM array, used as pl.ds index
def k4(xi_ref, x_ref, o_ref):
    i = xi_ref[0, 2] % 60
    o_ref[:] = x_ref[pl.ds(i, 1), :]


probe("int scalar read -> pl.ds", k4, xi, x)


# 5. reshape (1,128) -> (8,16)
def k5(x_ref, o_ref):
    rec = x_ref[pl.ds(2, 1), :].reshape(8, 16)
    col = rec[:, 0:1]  # (8,1)
    o_ref[:] = jnp.broadcast_to(col, (8, 128)).sum(0, keepdims=True)


probe("reshape (1,128)->(8,16)", k5, x)


# 6. SMEM scratch write at dynamic index + read back
def k6(x_ref, o_ref, sm):
    sm[3] = jnp.int32(7)
    i = sm[3] * 8 % 60
    o_ref[:] = x_ref[pl.ds(i, 1), :]


probe("SMEM dyn write/read", k6, x, scratch=[pltpu.SMEM((16,), jnp.int32)])


# 7. while loop with scalar carry + SMEM stack
def k7(x_ref, o_ref, sm):
    sm[0] = 5

    def body(c):
        sp, acc = c
        v = sm[sp - 1]
        return sp - 1, acc + v

    def cond(c):
        return c[0] > 0

    sm[1] = 2
    sm[2] = 3
    sm[3] = 4
    sm[4] = 1
    sp, acc = jax.lax.while_loop(cond, body, (jnp.int32(5), jnp.int32(0)))
    o_ref[:] = jnp.full((1, 128), acc.astype(jnp.float32), jnp.float32)


probe("while + SMEM stack", k7, x, scratch=[pltpu.SMEM((16,), jnp.int32)])


# 8. lane reduce (8,128)->(8,1) then compare per-sublane
def k8(x_ref, o_ref):
    a = x_ref[0:8, :]
    m = jnp.max(a, axis=1, keepdims=True)  # (8,1)
    o_ref[:] = m.sum(0, keepdims=True) + jnp.zeros((1, 128))


probe("lane reduce (8,128)->(8,1)", k8, x)


# 9. float->int bitcast of (1,128) vector
def k9(x_ref, o_ref):
    v = pltpu.bitcast(x_ref[0:1, :], jnp.int32)
    o_ref[:] = v.astype(jnp.float32)


probe("bitcast 2D f32->i32", k9, x)


# 10. strided lane slice [0:128:16]
def k10(x_ref, o_ref):
    v = x_ref[0:1, 0:128:16]  # (1,8)
    o_ref[:] = jnp.pad(v, ((0, 0), (0, 120)))


probe("strided lane slice", k10, x)
