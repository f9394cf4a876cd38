"""Interactive viewer loop (GUI analogue): camera math, progressive
accumulation + reset-on-edit semantics, method switching, HTTP surface.
Reference behaviors: hydra_app/Camera.h, main_app_window.cpp:137-400."""
import json
import threading
import urllib.request

import numpy as np

from hydracore_tpu.app.viewer import (FreeCamera, InteractiveSession,
                                      make_server)
from hydracore_tpu.scene.procedural import SceneBuilder
from hydracore_tpu.scene.statefile import CameraDesc


def _tiny_scene():
    b = SceneBuilder()
    m = b.add_material(diff_color=np.asarray([0.7, 0.5, 0.3], np.float32))
    b.add_rect([0, -1, 0], [2, 0, 0], [0, 0, 2], m)
    b.add_sphere([0, 0, 0], 0.6, m, n_seg=10, n_ring=6)
    b.sky([0.7, 0.8, 1.0])
    sc = b.build([0, 0.5, 3.0], [0, 0, 0], fov=45.0, width=24, height=18,
                 trace_depth=3)
    desc = CameraDesc(position=np.array([0, 0.5, 3.0], np.float32),
                      look_at=np.zeros(3, np.float32),
                      up=np.array([0, 1, 0], np.float32), fov=45.0)
    return sc, desc


def test_free_camera_math():
    """offsetOrientation keeps the frame orthonormal; offsetPosition
    translates pos and look_at together (Camera.h semantics)."""
    c = FreeCamera(pos=np.array([0.0, 1.0, -10.0]))
    f0 = c.forward()
    c.offset_orientation(10.0, 25.0)
    f, r, u = c.forward(), c.right(), c.up
    assert abs(np.dot(f, u)) < 1e-6 and abs(np.linalg.norm(u) - 1) < 1e-6
    assert abs(np.linalg.norm(f) - 1) < 1e-6
    assert not np.allclose(f, f0)
    p0, l0 = c.pos.copy(), c.look_at.copy()
    c.offset_position(np.array([1.0, 2.0, 3.0]))
    assert np.allclose(c.pos - p0, [1, 2, 3])
    assert np.allclose(c.look_at - l0, [1, 2, 3])


def test_session_accumulates_and_resets_on_camera_move():
    sc, desc = _tiny_scene()
    s = InteractiveSession(sc, desc, seed=11)
    assert s.step() == 1 and s.step() == 2
    img0, spp = s.frame()
    assert spp == 2 and img0.dtype == np.uint8 and img0.shape == (18, 24, 3)
    assert img0.max() > 0
    # W key: move forward => accumulation resets, image changes
    pos0 = s.cam.pos.copy()
    s.process_input(keys={"w"}, dt=0.3)
    assert np.dot(s.cam.pos - pos0, s.cam.forward()) > 0
    assert s.step() == 1  # reset happened
    img1, spp1 = s.frame()
    assert spp1 == 1 and not np.array_equal(img0, img1)


def test_session_method_switch():
    sc, desc = _tiny_scene()
    s = InteractiveSession(sc, desc, seed=7)
    s.step()
    s.set_method("lighttracing")
    assert s.step() == 1  # reset + renders under LT
    assert s.status()["method"] == "lighttracing"
    img, _ = s.frame()
    assert np.isfinite(img.astype(np.float64)).all()
    s.set_method("ibpt")
    assert s.step() == 1
    try:
        s.set_method("nosuch")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_session_wheel_zoom_clamps_fov():
    sc, desc = _tiny_scene()
    s = InteractiveSession(sc, desc)
    s.process_input(wheel=-1000.0)
    assert s.cam.fov == 180.0 or s.cam.fov <= 180.0
    s.process_input(wheel=1e6)
    assert s.cam.fov >= 1.0


def test_http_surface():
    """GET / + /frame.png + /status, POST /input — the full wire protocol."""
    sc, desc = _tiny_scene()
    s = InteractiveSession(sc, desc, seed=5)
    s.step()
    server = make_server(s, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        html = urllib.request.urlopen(base + "/").read()
        assert b"hydracore_tpu viewer" in html
        png = urllib.request.urlopen(base + "/frame.png").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        st = json.loads(urllib.request.urlopen(base + "/status").read())
        assert st["spp"] == 1 and st["method"] == "pathtracing"
        body = json.dumps({"keys": ["w"], "dt": 0.2}).encode()
        req = urllib.request.Request(base + "/input", data=body, method="POST")
        assert json.loads(urllib.request.urlopen(req).read())["ok"]
        assert s._dirty  # camera moved => next step resets
        body = json.dumps({"method": "sbdpt"}).encode()
        req = urllib.request.Request(base + "/input", data=body, method="POST")
        urllib.request.urlopen(req)
        assert s.status()["method"] == "sbdpt"
    finally:
        server.shutdown()
        server.server_close()


def test_raytracing_preview_mode():
    """RENDER_METHOD_RT normals preview (DrawNormals, GPUOCLLayer.cpp:1460):
    deterministic primary-only view, no accumulation."""
    sc, desc = _tiny_scene()
    s = InteractiveSession(sc, desc)
    s.set_method("raytracing")
    assert s.step() == 1 and s.step() == 1  # never accumulates past 1
    img, spp = s.frame()
    assert spp == 1
    # sphere faces the camera: center pixels should be normal-ish blue-grey
    # (n ~ +z => rgb ~ (0.5, 0.5, 1.0)); background = env rays, normal 0
    c = img[9, 12].astype(np.float64) / 255.0
    assert c[2] > 0.8 and abs(c[0] - 0.5) < 0.2, c
    s.set_method("pathtracing")
    assert s.step() == 1  # switching back resets and accumulates again
    assert s.step() == 2
