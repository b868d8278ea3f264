"""Live preview server tests (GUI analogue, ui/preview.py)."""

import json
import urllib.request

import numpy as np

from echorenderer_tpu.ui.preview import PreviewServer, PreviewState


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


class TestPreviewServer:
    def test_endpoints(self):
        state = PreviewState()
        server = PreviewServer(state).start()
        try:
            code, ctype, body = _get(server.port, "/")
            assert code == 200 and "text/html" in ctype
            assert b"echorenderer-tpu" in body

            code, _, _ = _get(server.port, "/frame.png")
            assert code == 404  # no frame yet

            state.publish_status(epoch=2, noise=0.1)
            code, ctype, body = _get(server.port, "/status.json")
            status = json.loads(body)
            assert status["epoch"] == 2 and status["noise"] == 0.1

            img = np.random.RandomState(0).uniform(0, 2, (8, 8, 3)).astype(np.float32)
            state.publish_frame(img)
            code, ctype, body = _get(server.port, "/frame.png")
            assert code == 200 and ctype == "image/png"
            assert body[:8] == b"\x89PNG\r\n\x1a\n"

            code, _, _ = _get(server.port, "/nope")
            assert code == 404
        finally:
            server.stop()

    def test_render_publishes_frames(self):
        """End-to-end: a render loop publishes progressive frames."""
        from echorenderer_tpu.models import scenes
        from echorenderer_tpu.processes.render import EvaluationProfile, render_layer
        from echorenderer_tpu.scene.prepare import prepare_scene

        state = PreviewState()
        frames = []

        def progress(epoch, max_epoch, noise, layer="main", samples=0, image=None):
            if image is not None:
                state.publish_frame(image)
                frames.append(image.shape)
            state.publish_status(epoch=epoch)

        scene = prepare_scene(scenes.cornell_box())
        render_layer(
            scene,
            EvaluationProfile(evaluator="path", samples_per_epoch=2, min_epoch=2,
                              max_epoch=2, noise_threshold=0.0, bounce_limit=3),
            (12, 8),
            progress=progress,
        )
        assert frames == [(8, 12, 3), (8, 12, 3)]
        assert state.frame_png() is not None
        assert state.status()["epoch"] == 2
