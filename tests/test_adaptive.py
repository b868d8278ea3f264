"""Per-pixel adaptive sampling (reference EvaluationOperation.cs:111-137):
pixels individually stop sampling once their own Welford noise passes the
threshold, concentrating the budget on hard pixels. Gate (VERDICT #5):
reaching the quality target must cost meaningfully fewer samples than the
frame-global policy that keeps every pixel sampling until the worst one
converges."""

import numpy as np
import pytest

from echorenderer_tpu.models import scenes
from echorenderer_tpu.processes.render import EvaluationProfile, render_layer
from echorenderer_tpu.processes.tiles import lane_order
from echorenderer_tpu.scene.prepare import prepare_scene


RES = (64, 32)
THRESHOLD = 0.15  # tuned so the fixed policy needs ~6 epochs at this res
SPE = 8
MAX_EPOCH = 40


@pytest.fixture(scope="module")
def cornell():
    return prepare_scene(scenes.cornell_box())


def _profile(adaptive):
    return EvaluationProfile(
        evaluator="path", samples_per_epoch=SPE, min_epoch=2, max_epoch=MAX_EPOCH,
        noise_threshold=THRESHOLD, bounce_limit=4, adaptive=adaptive,
    )


def test_adaptive_saves_samples_at_same_quality(cornell):
    img_fixed, info_fixed = render_layer(cornell, _profile(False), RES, seed=3)
    img_adapt, info_adapt = render_layer(cornell, _profile(True), RES, seed=3)

    # both must actually converge within the budget
    assert info_fixed["epochs"] < MAX_EPOCH
    assert info_adapt["epochs"] <= info_fixed["epochs"] + 2

    # the adaptive run reaches the same per-pixel quality bar with
    # meaningfully fewer samples (reference saw -44% on the BMW scene)
    assert info_adapt["samples"] < 0.7 * info_fixed["samples"]

    # both are unbiased estimators of the same image
    scale = max(float(np.mean(img_fixed)), 1e-6)
    assert float(np.mean(np.abs(img_adapt - img_fixed))) / scale < 0.35


def test_adaptive_deterministic(cornell):
    a, ia = render_layer(cornell, _profile(True), RES, seed=7)
    b, ib = render_layer(cornell, _profile(True), RES, seed=7)
    np.testing.assert_array_equal(a, b)
    assert ia["samples"] == ib["samples"]


def test_lane_order_roundtrip():
    perm, inv = lane_order((50, 30), tile_size=8)
    n = 50 * 30
    assert sorted(perm.tolist()) == list(range(n))
    np.testing.assert_array_equal(perm[inv], np.arange(n))
    # lanes 0..63 cover one compact 8x8 tile
    px, py = perm[:64] % 50, perm[:64] // 50
    assert px.max() - px.min() < 8 and py.max() - py.min() < 8
