"""Live preview server tests (GUI analogue, ui/preview.py)."""

import json
import time
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

    def test_dashboard_areas(self):
        """The four EchoUI areas (EchoUI.cs:20-31): per-layer viewer with
        exact pixel inspector (ViewerUI), statistics table (RenderUI),
        operations table (SchedulerUI), log pane (LogsUI)."""
        import logging

        state = PreviewState()
        server = PreviewServer(state).start()
        try:
            # -- ViewerUI: multiple layers, exact linear pixel readout
            rs = np.random.RandomState(1)
            main = rs.uniform(0, 2, (6, 8, 3)).astype(np.float32)
            albedo = rs.uniform(0, 1, (6, 8, 3)).astype(np.float32)
            state.publish_frame(main)
            state.publish_frame(albedo, layer="albedo")

            _, _, body = _get(server.port, "/layers.json")
            layers = json.loads(body)
            assert layers == {"main": [6, 8, 3], "albedo": [6, 8, 3]}

            code, ctype, _ = _get(server.port, "/frame.png?layer=albedo")
            assert code == 200 and ctype == "image/png"

            # pixel (x=3, y=1 from the top) == linear row h-1-y
            _, _, body = _get(server.port, "/pixel.json?layer=albedo&x=3&y=1")
            px = json.loads(body)
            assert px["ok"]
            np.testing.assert_allclose(px["rgb"], albedo[4, 3], rtol=1e-6)
            _, _, body = _get(server.port, "/pixel.json?layer=albedo&x=99&y=0")
            assert not json.loads(body)["ok"]

            # -- RenderUI: named statistics
            state.publish_stats({"Ray/Traced": 1234, "Sample/Completed": 99})
            _, _, body = _get(server.port, "/stats.json")
            st = json.loads(body)
            assert st["Ray/Traced"] == 1234 and st["Sample/Completed"] == 99

            # -- SchedulerUI: operation rows, updated in place
            state.publish_operation("main", epoch="1/4", samples=100)
            state.publish_operation("main", epoch="2/4", samples=200)
            state.publish_operation("albedo", state="done")
            _, _, body = _get(server.port, "/operations.json")
            ops = json.loads(body)
            assert [o["operation"] for o in ops] == ["main", "albedo"]
            assert ops[0]["epoch"] == "2/4" and ops[0]["samples"] == 200

            # -- LogsUI: records from the 'echo' structured logger
            logging.getLogger("echo.test").warning("warn %d", 7)
            _, _, body = _get(server.port, "/logs.json")
            logs = json.loads(body)
            assert any(
                l["msg"] == "warn 7" and l["level"] == "WARNING" for l in logs
            )

            # dashboard page mentions every area
            _, _, body = _get(server.port, "/")
            for area in (b"operations", b"statistics", b"logs", b"layer"):
                assert area in body
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


# ---------------------------------------------------------------------------
# round-2 GUI depth: tile fill-in, watch/reschedule, final stats
# ---------------------------------------------------------------------------

def test_tile_progressive_bitwise_identical_and_fills_in():
    """tile_progress renders epoch 0 as spiral tile batches: partial frames
    stream through the callback, final image is bitwise unchanged."""
    import jax.numpy as jnp

    from echorenderer_tpu.models import scenes
    from echorenderer_tpu.processes.render import EvaluationProfile, render_layer
    from echorenderer_tpu.scene.prepare import prepare_scene

    prepared = prepare_scene(scenes.cornell_box())
    prof = EvaluationProfile(
        evaluator="path", samples_per_epoch=4, min_epoch=1, max_epoch=1,
        bounce_limit=3, adaptive=False,
    )
    partials = []

    def cb(epoch, max_epoch, noise, layer="main", samples=0, image=None, **kw):
        if "tile_batch" in kw and image is not None:
            partials.append((kw["tile_batch"], np.asarray(image).copy()))

    img_tiled, _ = render_layer(prepared, prof, (48, 32), seed=5, progress=cb,
                                tile_progress=4)
    img_plain, _ = render_layer(prepared, prof, (48, 32), seed=5)
    np.testing.assert_array_equal(img_tiled, img_plain)

    # 48x32 with 32px tiles = 2 spiral tiles -> batches clamp to 2
    assert len(partials) == 2
    # coverage grows monotonically (spiral fill-in): nonzero pixels increase
    nz = [int((np.abs(p).sum(-1) > 0).sum()) for _, p in partials]
    assert nz == sorted(nz) and nz[0] < nz[-1]
    assert [b for (b, _n), _ in partials] == [1, 2]


def test_watch_file_triggers_on_change(tmp_path):
    """The save-to-reschedule watcher (reference SchedulerUI.cs:22-34)."""
    import threading

    from echorenderer_tpu.terminal import watch_file

    f = tmp_path / "scene.echo"
    f.write_text("a")
    stop = threading.Event()
    fired = threading.Event()

    def on_change():
        fired.set()
        stop.set()

    t = threading.Thread(
        target=watch_file, args=(str(f), on_change, stop, 0.05), daemon=True
    )
    t.start()
    time.sleep(0.2)
    f.write_text("b")  # mtime bump
    assert fired.wait(timeout=5.0)
    t.join(timeout=2.0)
    assert not t.is_alive()
