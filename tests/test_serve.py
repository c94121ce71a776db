"""MJPEG preview server end-to-end over real HTTP (CPU, tiny frames)."""
import json
import time
import urllib.request

from roadvision_tpu.config import DEFAULTS, merge


def _tiny_cfg():
    return merge(DEFAULTS, {
        "camera": {"source": "synthetic:0", "width": 96, "height": 64},
        "preprocess": {"enabled": True, "chain": [
            {"name": "MedianDerain", "params": {"ksize": 3}}]},
        "detect": {"enabled": True, "model": "missing.pt", "imgsz": 64,
                   "max_det": 8, "conf_thres": 0.0, "classes_keep": []},
        "tracking": {"enabled": True},
        "preview": {"compare": {"enable": True, "layout": "h"}},
        "tpu": {"batch_size": 2, "track_slots": 8},
    })


def test_serve_stream_and_stats():
    import tools.serve as serve

    server, hub, worker = serve.serve_background(
        _tiny_cfg(), port=0, max_frames=6)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        # stats eventually reports produced frames (first-batch compile
        # of the fused step dominates the wait)
        deadline = time.time() + 300
        frames = 0
        while time.time() < deadline:
            stats = json.loads(
                urllib.request.urlopen(base + "/stats", timeout=5).read())
            frames = stats["frames"]
            if frames >= 2:
                break
            time.sleep(0.2)
        assert frames >= 2, stats

        # index page embeds the stream
        html = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"/stream" in html

        # the stream yields multipart JPEG parts
        resp = urllib.request.urlopen(base + "/stream", timeout=10)
        assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]
        data = b""
        deadline = time.time() + 30
        while data.count(b"\xff\xd8\xff") < 1 and time.time() < deadline:
            data += resp.read(4096)
        assert data.count(b"\xff\xd8\xff") >= 1
        assert b"Content-Type: image/jpeg" in data

        # unknown path 404s
        try:
            urllib.request.urlopen(base + "/nope", timeout=5)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        worker.join(timeout=120)
        assert not worker.is_alive()
        final = json.loads(
            urllib.request.urlopen(base + "/stats", timeout=5).read())
        assert final["done"] and final["frames"] == 6

        # live detections endpoint: last frame's boxes as JSON
        dets = json.loads(
            urllib.request.urlopen(base + "/detections", timeout=5).read())
        assert dets["frame"] == 6 and dets["ts"] is not None
        assert isinstance(dets["detections"], list)
        if dets["detections"]:  # conf 0.0 + random init: boxes do flow
            d0 = dets["detections"][0]
            assert {"bbox", "conf", "cls_id", "name",
                    "track_id"} <= set(d0)
            assert len(d0["bbox"]) == 4
    finally:
        hub.close()
        server.shutdown()


def test_serve_multi_stream():
    """tpu.mesh.enable + camera.sources routes serve to the sharded
    multi-stream loop and streams the tiled grid (VERDICT r2 #2)."""
    import jax
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 (virtual) devices")
    import tools.serve as serve

    cfg = merge(_tiny_cfg(), {
        "camera": {"sources": ["synthetic:2", "synthetic:3",
                               "synthetic:4", "synthetic:5"]},
        "tpu": {"mesh": {"enable": True, "axis": "data"}},
    })
    assert serve._wants_multi(cfg)
    server, hub, worker = serve.serve_background(cfg, port=0, max_frames=4)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        worker.join(timeout=300)
        assert not worker.is_alive()
        final = json.loads(
            urllib.request.urlopen(base + "/stats", timeout=5).read())
        assert final["done"] and final["frames"] == 4
        dets = json.loads(
            urllib.request.urlopen(base + "/detections", timeout=5).read())
        assert isinstance(dets["detections"], list)
        if dets["detections"]:
            assert "stream" in dets["detections"][0]
    finally:
        hub.close()
        server.shutdown()


def test_events_endpoint_and_since_filter():
    """/events serves the analytics event log (id-stamped, bounded),
    ?since=N filters — exercised against a hand-fed hub so the content
    is deterministic."""
    import threading
    from http.server import ThreadingHTTPServer

    import tools.serve as serve

    hub = serve.FrameHub()
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 serve._make_handler(hub))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        jpeg = b"\xff\xd8\xff fake"
        hub.publish(jpeg, 30.0, 1, events=[
            {"line": "main", "direction": "pos", "track_id": 1, "ts": 0.1},
            {"zone": "j", "event": "enter", "track_id": 1, "ts": 0.1}])
        hub.publish(jpeg, 30.0, 1, events=[
            {"event": "stopped", "track_id": 2, "ts": 0.4,
             "wrong_way": True}])
        evs = json.loads(urllib.request.urlopen(
            base + "/events", timeout=5).read())["events"]
        assert [e["id"] for e in evs] == [1, 2, 3]
        assert evs[0]["line"] == "main" and evs[2]["event"] == "stopped"
        evs2 = json.loads(urllib.request.urlopen(
            base + "/events?since=2", timeout=5).read())["events"]
        assert [e["id"] for e in evs2] == [3]
        # bad since value → unfiltered, not a 500
        evs3 = json.loads(urllib.request.urlopen(
            base + "/events?since=x", timeout=5).read())["events"]
        assert len(evs3) == 3
    finally:
        server.shutdown()


def test_metrics_endpoint_and_dashboard_index():
    import threading
    from http.server import ThreadingHTTPServer

    import tools.serve as serve

    hub = serve.FrameHub()
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 serve._make_handler(hub))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        hub.publish(b"\xff\xd8\xff x", 29.5, 3,
                    events=[{"event": "stopped", "track_id": 1, "ts": 1.0}])
        text = urllib.request.urlopen(base + "/metrics",
                                      timeout=5).read().decode()
        assert "roadvision_frames_total 1" in text
        assert "roadvision_fps 29.5" in text
        assert "roadvision_analytics_events_total 1" in text
        assert "# TYPE roadvision_fps gauge" in text
        html = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"/stream" in html and b"/events?since=" in html
    finally:
        server.shutdown()
