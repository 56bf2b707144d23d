"""Live training monitor: serve, stream losses, render page + images.

The reference exposes live training telemetry through visdom dashboards
(ref src/utils/visualizer.py:30-107, docs/train.md:4-5); the rebuild serves
the same capability from an in-process HTTP thread
(ihmr_tpu/utils/live_dashboard.py). These tests drive it over real sockets.
"""

import json
import urllib.request

import numpy as np
import pytest


@pytest.fixture()
def dash(tmp_path):
    from ihmr_tpu.utils.live_dashboard import LiveDashboard

    d = LiveDashboard(str(tmp_path / "web"), name="test-run")
    port = d.start(0)  # ephemeral
    assert port > 0
    yield d
    d.stop()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.status, r.read()


def test_index_page_serves(dash):
    status, body = _get(dash.port, "/")
    assert status == 200
    text = body.decode()
    assert "test-run" in text and "losses.json" in text and "<svg" in text


def test_losses_stream(dash):
    dash.update(1.0, {"total_loss": 3.5, "joints_2d_loss": 1.25})
    dash.update(2.0, {"total_loss": 2.5, "joints_2d_loss": 1.0})
    status, body = _get(dash.port, "/losses.json")
    assert status == 200
    data = json.loads(body)
    assert data["series"]["total_loss"] == [[1.0, 3.5], [2.0, 2.5]]
    assert data["series"]["joints_2d_loss"][1] == [2.0, 1.0]


def test_images_served_and_listed(dash, tmp_path):
    import cv2

    img_dir = tmp_path / "web" / "images"
    img_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / "epoch001_000000_pred.png"), np.zeros((8, 8, 3), np.uint8))

    status, body = _get(dash.port, "/losses.json")
    assert json.loads(body)["images"] == ["epoch001_000000_pred.png"]
    status, body = _get(dash.port, "/images/epoch001_000000_pred.png")
    assert status == 200 and body[:4] == b"\x89PNG"
    # path traversal is neutralized (basename only)
    status_404 = urllib.request.urlopen
    with pytest.raises(urllib.error.HTTPError):
        _get(dash.port, "/images/../secret.png")


def test_unknown_path_404(dash):
    with pytest.raises(urllib.error.HTTPError):
        _get(dash.port, "/nope")


def test_visualizer_integration(tmp_path):
    from ihmr_tpu.utils.visualizer import Visualizer

    viz = Visualizer(str(tmp_path), live_port=0)
    assert viz.dashboard is not None and viz.dashboard.port > 0
    viz.plot_current_errors(1.0, {"total_loss": 1.5})
    _, body = _get(viz.dashboard.port, "/losses.json")
    assert json.loads(body)["series"]["total_loss"] == [[1.0, 1.5]]
    viz.dashboard.stop()
