"""Live viewer (rso.metrics.live_view) — the live-GUI substitute.

Covers the contract of the reference's GUI thread (gui_thread.cpp:76-325):
state published per frame is visible to a concurrent client, the overlay
image is served, and the browser control verbs reach the processing loop's
key handler (demo-main.cpp:256-284 semantics).
"""
import json
import urllib.request

import numpy as np
import pytest

from rso.metrics.live_view import LiveViewer, RemoteControl


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(port, path, body):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=body.encode(), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, r.read()


@pytest.fixture
def viewer():
    rc = RemoteControl()
    v = LiveViewer(0, control=rc)
    port = v.start()
    yield v, rc, port
    v.stop()


class TestLiveViewer:
    def test_state_roundtrip_and_incremental(self, viewer):
        v, _, port = viewer
        T = np.eye(4)
        for i in range(5):
            T[:3, 3] = [i, 0.0, 2.0 * i]
            v.publish(i, T, valid=(i != 3), counters={"fps": 100.0 + i})
        _, ctype, body = _get(port, "/state")
        assert ctype == "application/json"
        s = json.loads(body)
        assert s["n"] == 5
        assert len(s["positions"]) == 5
        assert s["positions"][4] == [4.0, 0.0, 8.0]
        assert s["latest"]["frame"] == 4 and s["latest"]["valid"] is True
        assert s["latest"]["fps"] == 104.0

        # incremental poll: only the new tail comes back
        _, _, body = _get(port, "/state?since=4")
        s2 = json.loads(body)
        assert s2["positions"] == [[4.0, 0.0, 8.0]] and s2["gt"] is None

    def test_ground_truth_served_once(self, viewer):
        v, _, port = viewer
        gt = np.tile(np.eye(4), (3, 1, 1))
        gt[:, 0, 3] = [0, 1, 2]
        v.set_ground_truth(gt)
        s = json.loads(_get(port, "/state")[2])
        assert s["gt"] == [[0, 0, 0], [1, 0, 0], [2, 0, 0]]

    def test_index_page_and_missing_frame(self, viewer):
        _, _, port = viewer
        status, ctype, body = _get(port, "/")
        assert status == 200 and ctype == "text/html"
        assert b"rso live" in body and b"/state" in body
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(port, "/frame.jpg")
        assert ei.value.code == 404

    def test_frame_jpeg_served(self, viewer):
        v, _, port = viewer
        canvas = np.zeros((40, 80, 3), np.uint8)
        canvas[:, :40] = (0, 0, 255)
        v.publish(0, np.eye(4), True, None, canvas)
        status, ctype, body = _get(port, "/frame.jpg")
        assert status == 200 and ctype == "image/jpeg"
        assert body[:2] == b"\xff\xd8"  # JPEG SOI marker

    def test_control_verbs_reach_the_key_loop(self, viewer):
        v, rc, port = viewer
        for cmd in ("p", "s", "q"):
            status, body = _post(port, f"/control?t={v.token}", cmd)
            assert status == 200 and body == b"ok"
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, f"/control?t={v.token}", "x")  # unknown verb rejected
        assert ei.value.code == 400
        assert [rc.pop() for _ in range(4)] == ["p", "s", "q", None]

    def test_control_requires_token(self, viewer):
        """A local peer without the token cannot pause/quit the run; the
        served page carries the token so same-origin JS keeps working."""
        v, rc, port = viewer
        for path in ("/control", "/control?t=wrong"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(port, path, "q")
            assert ei.value.code == 403
        assert rc.pop() is None
        page = _get(port, "/")[2]
        assert v.token.encode() in page and b"%%TOKEN%%" not in page


class TestKeyControlRemote:
    """The demo's _KeyControl consumes RemoteControl commands even when
    stdin is not a TTY (headless server runs)."""

    def test_pause_step_quit_cycle(self):
        from rso.cli.demo import _KeyControl

        rc = RemoteControl()
        kc = _KeyControl(start_paused=False, remote=rc)
        kc.tty = False  # force the headless branch
        assert kc.wait_if_paused() is True  # no command -> run

        rc.push("p")  # pause...
        rc.push("s")  # ...then single-step releases exactly one frame
        assert kc.wait_if_paused() is True and kc.paused

        rc.push("p")  # resume
        assert kc.wait_if_paused() is True and not kc.paused

        rc.push("q")
        assert kc.wait_if_paused() is False  # quit


class TestOverlayFromState:
    def test_engine_state_overlay(self):
        """Run two synthetic frames through the real engine and render the
        octave-0 overlay from its state (the GUI-thread data path)."""
        from rso.engine import Engine
        from rso.metrics.live_view import overlay_from_state
        from rso.synthetic import make_sequence, synthetic_config

        seq = make_sequence(n_frames=2, n_points=400, H=200, W=320)
        eng = Engine(synthetic_config(), seq.cam)
        for left, right in seq.frames:
            eng.process_frame(left, right)
        canvas = overlay_from_state(seq.frames[-1][0], seq.frames[-1][1],
                                    eng.state)
        H, W = seq.frames[-1][0].shape
        assert canvas.shape == (H, 2 * W, 3) and canvas.dtype == np.uint8
        assert canvas.any()
