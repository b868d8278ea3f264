"""Learned denoiser: a kernel-predicting CNN in the reference's OIDN slot
(Processes/Composition/OidnDenoise.cs:17-230 wraps Intel Open Image Denoise;
SURVEY §2b row 3 calls for a JAX learned model as the TPU-native answer).

Architecture (KPCN-lite, after Bako et al. 2017 "Kernel-Predicting
Convolutional Networks for Denoising Monte Carlo Renderings"): the network
sees the albedo-demodulated noisy color plus the albedo and shading-normal
AOVs and predicts a per-pixel 5x5 softmax kernel; the kernel filters the
demodulated color, and the albedo remodulates the result. Predicting a
normalized kernel (instead of the color directly) keeps the output within
the convex hull of its neighborhood — no color shifts, no hallucination —
which is what makes a tiny network usable.

Convolutions are 3x3 NHWC with increasing dilation (1,1,2,4,1): a 27-pixel
receptive field from five layers, all MXU-friendly shapes. ~40k parameters,
committed at echorenderer_tpu/data/denoiser.npz (trained on this
renderer's own renders by tools/train_denoiser.py — 16spp inputs, 2048spp
targets over seed/camera/scene variations of the showcase scenes).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

KERNEL = 5  # predicted filter size (5x5 softmax weights per pixel)
WIDTH = 32  # conv channels
DILATIONS = (1, 1, 2, 4, 1)
_EPS = 1e-3

WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "denoiser.npz",
)


def init_params(key) -> dict:
    """He-initialized parameter pytree."""
    sizes = []
    c_in = 9  # demodulated color (3) + albedo (3) + normal (3)
    for i, _d in enumerate(DILATIONS):
        c_out = KERNEL * KERNEL if i == len(DILATIONS) - 1 else WIDTH
        sizes.append((c_in, c_out))
        c_in = c_out
    params = {}
    for i, (ci, co) in enumerate(sizes):
        key, k1 = jax.random.split(key)
        params[f"w{i}"] = (
            jax.random.normal(k1, (3, 3, ci, co), jnp.float32)
            * np.sqrt(2.0 / (9 * ci))
        )
        params[f"b{i}"] = jnp.zeros((co,), jnp.float32)
    return params


def _conv(x, w, b, dilation):
    return (
        jax.lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1),
            padding="SAME",
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )


def apply(params: dict, color, albedo, normal):
    """Denoise a batch: color/albedo/normal are (N, H, W, 3) linear float32.
    Returns the filtered color (N, H, W, 3)."""
    demod = color / (albedo + _EPS)
    # log compression tames HDR fireflies without losing ordering
    feat = jnp.concatenate(
        [jnp.log1p(demod), albedo, normal], axis=-1
    )
    x = feat
    for i, d in enumerate(DILATIONS):
        x = _conv(x, params[f"w{i}"], params[f"b{i}"], d)
        if i < len(DILATIONS) - 1:
            x = jax.nn.relu(x)
    weights = jax.nn.softmax(x, axis=-1)  # (N, H, W, K*K)

    # gather the 5x5 neighborhood of the demodulated color and apply the
    # predicted kernel; implemented as a shifted-sum (25 adds) which XLA
    # fuses — no gather, no im2col buffer
    r = KERNEL // 2
    pad = jnp.pad(demod, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    h, w = color.shape[1], color.shape[2]
    out = jnp.zeros_like(demod)
    for dy in range(KERNEL):
        for dx in range(KERNEL):
            k = weights[..., dy * KERNEL + dx : dy * KERNEL + dx + 1]
            out = out + k * pad[:, dy : dy + h, dx : dx + w, :]
    return out * (albedo + _EPS)


def load_params() -> dict | None:
    """Committed weights, or None when absent (callers fall back to the
    cross-bilateral filter)."""
    if not os.path.exists(WEIGHTS_PATH):
        return None
    data = np.load(WEIGHTS_PATH)
    return {k: jnp.asarray(data[k]) for k in data.files}


def denoise(color, albedo, normal, params: dict | None = None):
    """Single-image entry point: (H, W, 3) in, (H, W, 3) out."""
    if params is None:
        params = load_params()
    if params is None:
        raise FileNotFoundError(
            f"no denoiser weights at {WEIGHTS_PATH}; run tools/train_denoiser.py"
        )
    out = apply(
        params, color[None], albedo[None], normal[None]
    )
    return out[0]
