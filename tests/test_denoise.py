"""Learned denoiser gate (VERDICT #7; reference OidnDenoise.cs:17-230):
the committed kernel-predicting CNN must beat the cross-bilateral filter
on MSE at 16 spp on the three showcase scenes. The eval pairs are
unseen-seed renders of this renderer committed as a fixture by
tools/train_denoiser.py."""

import os

import numpy as np
import pytest

from echorenderer_tpu.processes import denoise
from echorenderer_tpu.processes.composition import BilateralDenoise, LearnedDenoise

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "denoise_eval.npz")

needs_weights = pytest.mark.skipif(
    not (os.path.exists(FIXTURE) and os.path.exists(denoise.WEIGHTS_PATH)),
    reason="denoiser weights/fixture not committed yet (run tools/train_denoiser.py)",
)


def _mse(a, b):
    ta = np.log1p(np.maximum(np.asarray(a), 0.0))
    tb = np.log1p(np.maximum(np.asarray(b), 0.0))
    return float(np.mean((ta - tb) ** 2))


def _ssim(a, b):
    """Global SSIM on log-tonemapped luminance (single-window variant)."""
    lum = lambda x: np.log1p(np.maximum(np.asarray(x), 0.0)).mean(-1)
    x, y = lum(a), lum(b)
    mx, my = x.mean(), y.mean()
    vx, vy = x.var(), y.var()
    cxy = ((x - mx) * (y - my)).mean()
    c1, c2 = 0.01**2, 0.03**2
    return float(
        ((2 * mx * my + c1) * (2 * cxy + c2))
        / ((mx * mx + my * my + c1) * (vx + vy + c2))
    )


@needs_weights
@pytest.mark.parametrize("scene", ["cornell", "ball", "spheres"])
def test_learned_beats_bilateral(scene):
    fx = np.load(FIXTURE)
    noisy = fx[f"{scene}_noisy"]
    albedo = fx[f"{scene}_albedo"]
    normal = fx[f"{scene}_normal"]
    clean = fx[f"{scene}_clean"]

    params = denoise.load_params()
    learned = np.asarray(denoise.denoise(noisy, albedo, normal, params))
    bilateral = np.asarray(
        BilateralDenoise().apply(
            {"main": noisy, "albedo": albedo, "normal_depth": normal}
        )["main"]
    )

    m_l, m_b, m_n = _mse(learned, clean), _mse(bilateral, clean), _mse(noisy, clean)
    assert m_l < m_b, f"learned {m_l:.6f} !< bilateral {m_b:.6f} (noisy {m_n:.6f})"
    assert m_l < m_n  # and it actually denoises
    assert _ssim(learned, clean) >= _ssim(bilateral, clean) - 0.005


@needs_weights
def test_composition_operator_uses_learned():
    """LearnedDenoise routes through the CNN when AOVs + weights exist."""
    fx = np.load(FIXTURE)
    layers = {
        "main": fx["cornell_noisy"],
        "albedo": fx["cornell_albedo"],
        "normal_depth": fx["cornell_normal"],
    }
    out = LearnedDenoise().apply(dict(layers))["main"]
    params = denoise.load_params()
    direct = denoise.denoise(
        fx["cornell_noisy"], fx["cornell_albedo"], fx["cornell_normal"], params
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), rtol=1e-5)


def test_operator_falls_back_without_aovs():
    """No AOV layers -> bilateral fallback, never a crash."""
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    out = LearnedDenoise().apply({"main": img})["main"]
    assert np.asarray(out).shape == (16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()
