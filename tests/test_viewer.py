"""Interactive viewer: HTTP surface + control-event semantics.

Covers the subsystem replacing the reference's imgui/GLFW layer
(main.cpp:363-431, 614-663): page serve, long-polled frames, JSON state,
and the frameCounter-reset-on-change contract (main.cpp:372-387).
"""
import json
import urllib.request

import numpy as np
import pytest

from tpuray.scene.config import DebugView, RenderConfig
from tpuray.scene.procedural import make_test_scene
from tpuray.viewer.server import ViewerServer


@pytest.fixture(scope="module")
def server():
    scene = make_test_scene(subdiv=1)
    cfg = RenderConfig(width=32, height=32, max_tracing_depth=1,
                       num_atrous_iterations=2)
    s = ViewerServer(scene, cfg, port=0)  # ephemeral port
    s.start()
    yield s
    s.stop()


def _get(server, path):
    # the frame long-poll replies 204 (no X-Seq) if no new frame lands
    # within its 25 s window — possible when the whole suite shares the
    # CPU; retry until a frame arrives
    for _ in range(8):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}{path}", timeout=60) as r:
            if r.status == 204 and path.startswith("/frame.png"):
                continue
            return r.status, dict(r.headers), r.read()
    raise TimeoutError(f"no frame from {path} after 8 long-poll windows")


def test_page_and_state(server):
    code, _, body = _get(server, "/")
    assert code == 200 and b"tpuray" in body and b"max_tracing_depth" in body
    code, _, body = _get(server, "/state")
    state = json.loads(body)
    assert state["params"]["max_tracing_depth"] == 1
    assert state["width"] == 32 and state["view"] == int(DebugView.FINAL)


def test_frame_long_poll(server):
    code, headers, body = _get(server, "/frame.png?seq=-1")
    assert code == 200
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    seq = int(headers["X-Seq"])
    stats = json.loads(headers["X-Stats"])
    assert stats["frame"] >= 1 and stats["ms"] > 0
    # a second poll with the returned seq waits for a strictly newer frame
    code2, headers2, _ = _get(server, f"/frame.png?seq={seq}")
    assert code2 == 200 and int(headers2["X-Seq"]) > seq


def test_control_resets_accumulation(server):
    _get(server, "/frame.png?seq=-1")  # ensure frames are flowing
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/control",
        data=json.dumps({"type": "param", "name": "sigma_l",
                         "value": 2.5}).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert json.loads(r.read())["ok"]
    # wait for the event to be applied (a couple of frames)
    seq = int(_get(server, "/frame.png?seq=-1")[1]["X-Seq"])
    for _ in range(3):
        seq = int(_get(server, f"/frame.png?seq={seq}")[1]["X-Seq"])
    assert server.renderer.cfg.sigma_l == 2.5
    code, _, body = _get(server, "/state")
    assert json.loads(body)["params"]["sigma_l"] == 2.5


def test_camera_events(server):
    yaw0 = server.camera.yaw_deg
    server.submit({"type": "rotate", "dx": 5.0, "dy": 0.0})
    server.submit({"type": "dolly", "d": 0.1})
    server.submit({"type": "pan", "forward": 0.05, "right": 0.0})
    seq = int(_get(server, "/frame.png?seq=-1")[1]["X-Seq"])
    for _ in range(3):
        seq = int(_get(server, f"/frame.png?seq={seq}")[1]["X-Seq"])
    assert server.camera.yaw_deg == pytest.approx(yaw0 + 5.0)


def test_view_switch(server):
    server.submit({"type": "view", "view": int(DebugView.SVGF_VARIANCE)})
    seq = int(_get(server, "/frame.png?seq=-1")[1]["X-Seq"])
    for _ in range(2):
        seq = int(_get(server, f"/frame.png?seq={seq}")[1]["X-Seq"])
    assert server.view == DebugView.SVGF_VARIANCE
    server.submit({"type": "view", "view": int(DebugView.FINAL)})


def test_png_encode_decode_roundtrip(tmp_path):
    from tpuray.io.image import encode_png, read_png
    img = np.random.default_rng(3).random((17, 23, 3)).astype(np.float32)
    p = tmp_path / "x.png"
    p.write_bytes(encode_png(img))
    back = read_png(str(p))
    q = np.clip(img * 255 + 0.5, 0, 255).astype(np.uint8) / 255.0
    assert np.abs(back - q).max() < 1e-6
