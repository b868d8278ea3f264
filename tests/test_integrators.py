"""Integrator consistency tests — the golden-validation strategy the
reference relies on (StandardNaiveEvaluator as ground truth for the
MIS/NEE machinery, SURVEY.md §4 'what is not tested' remediation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.models import scenes
from echorenderer_tpu.processes.render import (
    EvaluationProfile,
    _sample_frame_jit,
    render_layer,
)
from echorenderer_tpu.scene.prepare import prepare_scene


@pytest.fixture(scope="module")
def cornell():
    return prepare_scene(scenes.cornell_box())


def _mean_image(scene, evaluator, res, spp, bounce=6, seed=0):
    s_sum, _ = _sample_frame_jit(
        scene, evaluator, res, seed, jnp.asarray(0, jnp.uint32), spp, bounce, 2.5
    )
    return np.asarray(s_sum) / spp


class TestEstimatorConsistency:
    def test_path_matches_naive(self, cornell):
        """NEE+MIS path tracing and brute-force naive tracing estimate the
        same radiance field — the central correctness property of the MIS
        machinery (validates pick/sample/pmf bookkeeping end to end)."""
        res = (24, 18)
        a = _mean_image(cornell, "path", res, spp=160, bounce=4)
        b = _mean_image(cornell, "naive", res, spp=640, bounce=4)
        # compare per-image means (naive has high variance per pixel)
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.05)
        # and spatial structure: correlation of pixel intensities
        ca = a.mean(-1) - a.mean()
        cb = b.mean(-1) - b.mean()
        corr = (ca * cb).sum() / np.sqrt((ca * ca).sum() * (cb * cb).sum())
        assert corr > 0.85

    def test_wavefront_matches_lockstep_bitwise(self, cornell):
        """Wavefront regeneration and the lockstep integrator share
        path_step, so their per-sample draws AND arithmetic are identical:
        the sample sums must be BITWISE equal (the sum-of-squares may
        differ by FMA contraction, so it gets a 2-ulp tolerance)."""
        res = (24, 18)
        spp = 3  # odd: keeps the wavefront on a single sample chain
        a, asq = _sample_frame_jit(
            cornell, "path", res, 0, jnp.asarray(0, jnp.uint32), spp, 6, 2.5
        )
        b, bsq = _sample_frame_jit(
            cornell, "path_lockstep", res, 0, jnp.asarray(0, jnp.uint32), spp, 6, 2.5
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(asq), np.asarray(bsq), rtol=1e-6)

    def test_deterministic_across_runs(self, cornell):
        res = (16, 12)
        a = _mean_image(cornell, "path", res, spp=4)
        b = _mean_image(cornell, "path", res, spp=4)
        np.testing.assert_array_equal(a, b)


class TestAdaptiveSampling:
    def test_noise_monotone_decreasing(self, cornell):
        """More epochs -> lower Welford noise metric (the adaptive
        termination signal, EvaluationOperation.cs:137)."""
        noises = []

        def progress(epoch, max_epoch, noise, **kw):
            noises.append(noise)

        render_layer(
            cornell,
            EvaluationProfile(
                evaluator="path", samples_per_epoch=8, min_epoch=4, max_epoch=4,
                noise_threshold=0.0, bounce_limit=4,
            ),
            (16, 12),
            progress=progress,
        )
        assert len(noises) == 4
        assert noises[-1] < noises[0]

    def test_threshold_stops_early(self, cornell):
        calls = []

        def progress(epoch, max_epoch, noise, **kw):
            calls.append(epoch)

        _, info = render_layer(
            cornell,
            EvaluationProfile(
                evaluator="path", samples_per_epoch=16, min_epoch=1, max_epoch=50,
                noise_threshold=10.0, bounce_limit=4,  # absurdly lax: stop at 1
            ),
            (16, 12),
            progress=progress,
        )
        assert info["epochs"] == 1


class TestWavefrontStatistics:
    def test_named_counters(self, cornell):
        """Device-side event counters (the reference's EvaluatorStatistics
        role): sample counts exact, ray counts plausible."""
        import functools

        import jax

        from echorenderer_tpu.evaluation.wavefront import sample_frame_wavefront

        n = 16 * 12
        pid = jnp.arange(n, dtype=jnp.uint32)
        pxy = jnp.stack([(pid % 16).astype(jnp.int32), (pid // 16).astype(jnp.int32)], -1)
        f = jax.jit(
            functools.partial(sample_frame_wavefront, bounce_limit=4, return_stats=True),
            static_argnames=("resolution", "count"),
        )
        _, _, stats = f(cornell, pid, pxy, (16, 12), 0, jnp.uint32(0), 4)
        assert float(stats["Sample/Completed"]) + float(stats["Sample/Rejected"]) == n * 4
        assert float(stats["Ray/Traced"]) >= n * 4  # at least one segment per sample
        assert float(stats["Bounce/Created"]) > 0
        assert int(stats["Loop/Iterations"]) > 0


def test_wavefront_lane_sorting_bitwise_invariant():
    """Morton/octant lane sorting (large-scene coherence) must not change a
    single bit of the per-pixel sums: every draw keys on (pixel, sample,
    dim) and the pixel identity travels with the lane."""
    import jax.numpy as jnp

    from echorenderer_tpu.evaluation.wavefront import sample_frame_wavefront
    from echorenderer_tpu.models import scenes as builtin
    from echorenderer_tpu.scene.prepare import prepare_scene

    scene = prepare_scene(builtin.cornell_box())
    n = 24 * 16
    pixel_id = jnp.arange(n, dtype=jnp.uint32)
    pixel_xy = jnp.stack(
        [(pixel_id % 24).astype(jnp.int32), (pixel_id // 24).astype(jnp.int32)], -1
    )
    kw = dict(bounce_limit=4, survivability=2.5)
    a, a2 = sample_frame_wavefront(
        scene, pixel_id, pixel_xy, (24, 16), 9, jnp.uint32(0), 3,
        sort_lanes=False, **kw
    )
    b, b2 = sample_frame_wavefront(
        scene, pixel_id, pixel_xy, (24, 16), 9, jnp.uint32(0), 3,
        sort_lanes=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))


def test_wavefront_liveness_cascade_bitwise(monkeypatch):
    """The liveness cascade (live lanes compacted into narrower static
    widths as paths die) must not change a single bit of the per-pixel
    sums: compaction is a pure permutation and every draw keys on
    (pixel, sample, dim)."""
    import jax.numpy as jnp

    from echorenderer_tpu.evaluation import wavefront
    from echorenderer_tpu.models import scenes as builtin
    from echorenderer_tpu.scene.prepare import prepare_scene

    scene = prepare_scene(builtin.cornell_box())
    n = 64 * 32  # 2048 lanes
    pixel_id = jnp.arange(n, dtype=jnp.uint32)
    pixel_xy = jnp.stack(
        [(pixel_id % 64).astype(jnp.int32), (pixel_id // 64).astype(jnp.int32)], -1
    )
    kw = dict(bounce_limit=4, survivability=2.5)
    a, a2 = wavefront.sample_frame_wavefront(
        scene, pixel_id, pixel_xy, (64, 32), 3, jnp.uint32(0), 2, **kw
    )
    monkeypatch.setattr(wavefront, "WAVE_CASCADE_MIN", 1024)
    monkeypatch.setattr(wavefront, "WAVE_CASCADE_FLOOR", 512)
    b, b2 = wavefront.sample_frame_wavefront(
        scene, pixel_id, pixel_xy, (64, 32), 3, jnp.uint32(0), 2, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
