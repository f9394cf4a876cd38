"""Cross-process shared accumulator (IHRSharedAccumImage role): locking,
accumulation, message channel, and a real 2-process CLI merge — the
reference's "rendering on 2 GPUs via OS shared memory" scenario
(main.cpp:224-241) with processes standing in for devices."""
import os
import subprocess
import sys
import uuid

import numpy as np

from hydracore_tpu.utils.shared_image import SharedAccumImage


def test_roundtrip_and_concurrent_adds():
    name = f"t_{uuid.uuid4().hex[:8]}"
    img = SharedAccumImage.create(name, 8, 6)
    try:
        a = np.random.default_rng(1).random((6, 8, 3)).astype(np.float32)
        b = np.random.default_rng(2).random((6, 8, 3)).astype(np.float32)
        assert img.add(a, 4) == 4
        att = SharedAccumImage.attach(name)
        assert att.add(b, 8) == 12
        fb, spp = img.read()
        assert spp == 12
        np.testing.assert_allclose(fb, a + b, rtol=1e-6)
        # concurrent adds from threads must sum exactly (flock serializes)
        import threading

        one = np.ones((6, 8, 3), np.float32)
        ts = [threading.Thread(
            target=lambda: SharedAccumImage.attach(name).add(one, 1))
            for _ in range(8)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        fb2, spp2 = img.read()
        assert spp2 == 20
        np.testing.assert_allclose(fb2, a + b + 8.0, rtol=1e-6)
        # message channel
        img.send_message("exitnow")
        assert att.recv_message() == "exitnow"
        img.clear()
        fb3, spp3 = img.read()
        assert spp3 == 0 and fb3.max() == 0
    finally:
        img.unlink()


def test_two_process_cli_merge(tmp_path):
    """Two CLI renderer processes with different seeds accumulate into one
    shared image; the merged frame matches a single-process render of the
    same scene within noise."""
    name = f"t2_{uuid.uuid4().hex[:8]}"
    lib = "/root/reference/hydra_app/tests/test_42"
    out1, out2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")

    def run(out, seed):
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from hydracore_tpu.app.cli import main;"
            f"main(['-inputlib','{lib}','-out','{out}','-spp','8',"
            f"'-width','32','-height','32','-seed','{seed}',"
            f"'-sharedimage','{name}'])")
        return subprocess.Popen([sys.executable, "-c", code],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT,
                                cwd="/root/repo")

    p1 = run(out1, 1)
    p2 = run(out2, 2)
    log1 = p1.communicate(timeout=900)[0].decode()
    log2 = p2.communicate(timeout=900)[0].decode()
    assert p1.returncode == 0, log1[-2000:]
    assert p2.returncode == 0, log2[-2000:]
    img = SharedAccumImage.attach(name)
    try:
        fb, spp = img.read()
        assert spp == 16, (spp, log1[-500:], log2[-500:])
        merged = fb / spp
        from hydracore_tpu.integrators.pt import render
        from hydracore_tpu.scene.scene import load_scene

        sc = load_scene(lib, width=32, height=32)
        ref = np.asarray(render(sc, spp=16, seed=3))
        rel = abs(merged.mean() - ref.mean()) / max(ref.mean(), 1e-9)
        assert rel < 0.1, (merged.mean(), ref.mean())
    finally:
        img.unlink()


def test_mlt_b_const_pooled_across_processes():
    """Two MLT worker processes publish (b_sum, b_weight) through the
    header; the master reads the pooled normalization constant — the
    reference's avgBrightness header channel for multi-process MLT
    (GPUOCLLayerAdvanced.cpp:422-423)."""
    name = f"t_{uuid.uuid4().hex[:8]}"
    img = SharedAccumImage.create(name, 4, 4)
    try:
        worker = (
            "import numpy as np, sys;"
            "from hydracore_tpu.utils.shared_image import SharedAccumImage;"
            "im = SharedAccumImage.attach(sys.argv[1]);"
            "im.add(np.ones((4, 4, 3), np.float32), 1,"
            "       b_sum_delta=float(sys.argv[2]),"
            "       b_weight_delta=float(sys.argv[3]))"
        )
        procs = [subprocess.Popen(
            [sys.executable, "-c", worker, name, str(b), str(w)],
            cwd="/root/repo")
            for b, w in ((6.0, 2.0), (2.0, 2.0))]
        for p in procs:
            assert p.wait() == 0
        # pooled b = (6 + 2) / (2 + 2) = 2.0 — not the mean of the two
        # per-process means unless weights are equal (here they are)
        assert abs(img.read_b() - 2.0) < 1e-12
        fb, spp = img.read()
        assert spp == 2
        # message channel must preserve the pooled estimator
        img.send_message("hello")
        assert abs(img.read_b() - 2.0) < 1e-12
    finally:
        img.unlink()
