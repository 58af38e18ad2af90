"""Live viewer: sim thread + HTTP endpoints + camera interaction
(nbody_v5.cu:327-356 display loop / :459-473 mouse callback parity)."""

import json
import urllib.request

import pytest

from nbody_tpu.config import SimConfig
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.viz.viewer import SimViewer, serve


@pytest.fixture(scope="module")
def viewer_server():
    cfg = SimConfig(n=512, use_pallas=False, render_width=160,
                    render_height=96, check_overflow=False)
    sim = Simulation(cfg, method="barnes_hut")
    viewer = SimViewer(sim, sim.init_state(), cfg, steps_per_frame=2)
    viewer.start()
    server = serve(viewer, port=0)  # OS-assigned free port
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield viewer, url
    server.shutdown()
    viewer.stop()


def _get(url, timeout=60.0):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_viewer_page_and_frame(viewer_server):
    viewer, url = viewer_server
    status, ctype, body = _get(url + "/")
    assert status == 200 and "text/html" in ctype
    assert b"/stream" in body and b"mousedown" in body

    status, ctype, body = _get(url + "/frame.jpg")
    assert status == 200 and ctype == "image/jpeg"
    assert body[:2] == b"\xff\xd8"  # JPEG SOI marker

    from PIL import Image
    import io as _io

    img = Image.open(_io.BytesIO(body))
    assert img.size == (160, 96)


def test_viewer_advances_and_reports(viewer_server):
    viewer, url = viewer_server
    viewer.wait_frame()
    _, _, body = _get(url + "/stats")
    stats = json.loads(body)
    assert stats["n"] == 512
    assert stats["step"] >= 2  # sim thread is actually stepping


def test_viewer_camera_mouse_parity(viewer_server):
    """Drag = 0.2 deg/px, wheel = +-150 per click (nbody_v5.cu:460-469)."""
    viewer, url = viewer_server
    d0 = viewer.stats()

    def post(msg):
        req = urllib.request.Request(
            url + "/cam", data=json.dumps(msg).encode(), method="POST")
        urllib.request.urlopen(req, timeout=30).read()

    post({"drag_dx": 10, "drag_dy": -5})
    post({"scroll": 1})
    s = viewer.stats()
    assert s["rot_y"] == pytest.approx(d0["rot_y"] + 10 * 0.2)
    assert s["rot_x"] == pytest.approx(d0["rot_x"] - 5 * 0.2)
    assert s["distance"] == pytest.approx(d0["distance"] - 150.0)
    post({"reset": 1})
    s = viewer.stats()
    assert s["distance"] == pytest.approx(d0["distance"])


def test_mjpeg_stream_yields_a_part(viewer_server):
    viewer, url = viewer_server
    req = urllib.request.urlopen(url + "/stream", timeout=60)
    assert "multipart/x-mixed-replace" in req.headers.get("Content-Type", "")
    # read until one full JPEG part arrives
    buf = b""
    while b"\xff\xd9" not in buf and len(buf) < 4_000_000:
        chunk = req.read(4096)
        if not chunk:
            break
        buf += chunk
    req.close()
    assert b"--frame" in buf and b"\xff\xd8" in buf
