"""Compositing stack: post-process operators over named AOV layers.

Rebuild of the reference's Processes/Composition layer as pure jnp image
ops. Where the reference runs each ICompositeLayer as async row-parallel
passes on the worker pool (CompositionOperation.cs:53-68, RunAsync
:113-124), here every enabled operator is fused into ONE jitted device
program over the full frame — XLA replaces the worker pool.

Operators (reference file in parens):
  TextureManage  copy/clear layers              (TextureManage.cs)
  AutoExposure   log-average luminance exposure (AutoExposure.cs)
  Bloom          threshold + Gaussian blur add  (Bloom.cs)
  ToneMapper     saturation/exposure + curve:
                 pass_through/basic_shoulder/reinhard/aces/hable
                                                (ToneMapper.cs:10-197)
  Vignette       radial darkening + film grain  (Vignette.cs)
  Watermark      blurred backdrop + bitmap text (Watermark.cs, InOut/Font.cs)
Errors are captured per layer instead of aborting the stack, matching
CompositionOperation's error-message collection.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import colors


# ----------------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------------


def gaussian_kernel1d(sigma: float, radius: int | None = None) -> np.ndarray:
    if radius is None:
        radius = max(1, int(3.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / max(sigma, 1e-6)) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur of an (H, W, C) image (the reference's
    ICompositeContext.GaussianBlurAsync helper). Edge-clamped."""
    if sigma <= 0.0:
        return image
    k = jnp.asarray(gaussian_kernel1d(sigma))
    r = (k.shape[0] - 1) // 2

    def conv_axis(img, axis):
        pad = [(0, 0)] * img.ndim
        pad[axis] = (r, r)
        padded = jnp.pad(img, pad, mode="edge")
        # (H, W, C) -> move axis to front, use correlate via conv
        moved = jnp.moveaxis(padded, axis, 0)
        out = jnp.zeros(jnp.moveaxis(img, axis, 0).shape, img.dtype)
        for i in range(k.shape[0]):
            out = out + k[i] * jax.lax.dynamic_slice_in_dim(moved, i, out.shape[0], 0)
        return jnp.moveaxis(out, 0, axis)

    return conv_axis(conv_axis(image, 0), 1)


# ----------------------------------------------------------------------------
# operators: each is a dataclass with .apply(layers: dict) -> dict
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class TextureManage:
    """Copy or clear named layers (reference TextureManage.cs)."""

    copy_from: str | None = None
    copy_to: str | None = None
    clear: str | None = None
    clear_color: tuple = (0.0, 0.0, 0.0)

    def apply(self, layers):
        if self.copy_from is not None and self.copy_to is not None:
            layers[self.copy_to] = layers[self.copy_from]
        if self.clear is not None and self.clear in layers:
            c = jnp.asarray(self.clear_color, jnp.float32)
            layers[self.clear] = jnp.broadcast_to(c, layers[self.clear].shape)
        return layers


@dataclasses.dataclass
class AutoExposure:
    """Center-weighted percentile-trimmed log-luminance exposure
    (reference AutoExposure.cs:52-120): each pixel's log luminance is
    weighted by (1 - EaseOutSmooth(2*dist_from_center)) * center_weight + 1,
    the weighted distribution is trimmed to the
    [percent_lower, 1 - percent_upper] mass band (the reference builds a
    128-bin histogram; here ONE weighted 2-op sort + cumsum gives the
    un-quantized equivalent), and exposure maps the trimmed average to
    `average_luminance`."""

    layer: str = "main"
    center_weight: float = 1.0
    percent_lower: float = 0.55
    percent_upper: float = 0.03
    average_luminance: float = 0.45
    clamp: tuple = (0.03125, 32.0)

    def apply(self, layers):
        img = layers[self.layer]
        h, w = img.shape[0], img.shape[1]
        lum = colors.luminance(img)
        log_lum = jnp.log2(jnp.maximum(lum, 1e-6))
        # center weight map (reference MainPass: uv distance from center *2)
        v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h - 0.5
        u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 0.5
        dist = jnp.sqrt(u[None, :] ** 2 + v[:, None] ** 2) * 2.0
        s = jnp.clip(dist, 0.0, 1.0)
        sig = 3.0 * s * s - 2.0 * s * s * s  # Curves.Sigmoid
        ease_out = sig * (2.0 - sig)  # Curves.EaseOut(Sigmoid)
        weight = (1.0 - ease_out) * self.center_weight + 1.0
        # weighted percentile trim via one ascending 2-operand sort
        ll = log_lum.reshape(-1)
        ww = jnp.broadcast_to(weight, log_lum.shape).reshape(-1)
        ll_s, ww_s = jax.lax.sort((ll, ww), num_keys=1)
        cum = jnp.cumsum(ww_s)
        total = cum[-1]
        lo = self.percent_lower * total
        hi = (1.0 - self.percent_upper) * total
        # mass of each sample inside [lo, hi] (partial bins clip linearly,
        # matching the histogram's split-to-adjacent-bins behavior)
        kept = jnp.minimum(cum, hi) - jnp.maximum(cum - ww_s, lo)
        kept = jnp.maximum(kept, 0.0)
        avg_log = jnp.sum(kept * ll_s) / jnp.maximum(jnp.sum(kept), 1e-20)
        average = jnp.exp2(avg_log)
        scale = jnp.clip(
            self.average_luminance / jnp.maximum(average, 1e-8), *self.clamp
        )
        layers[self.layer] = img * scale
        return layers


@dataclasses.dataclass
class Bloom:
    """Add a Gaussian-blurred copy of above-threshold highlights
    (reference Bloom.cs:10-40: FilterPass -> blur -> additive merge)."""

    layer: str = "main"
    intensity: float = 0.88
    threshold: float = 0.95
    sigma: float = 0.01  # as a fraction of image width

    def apply(self, layers):
        img = layers[self.layer]
        lum = colors.luminance(img)[..., None]
        excess = jnp.maximum(img - self.threshold, 0.0)
        bright = jnp.where(lum > self.threshold, excess, 0.0)
        sigma_px = self.sigma * img.shape[1]
        layers[self.layer] = img + gaussian_blur(bright, sigma_px) * self.intensity
        return layers


def _curve_pass_through(l):
    return l


def _curve_basic_shoulder(l, shoulder=0.5):
    """Linear toe + smooth shoulder rolling off to 1 (reference
    ToneMapper.BasicShoulder)."""
    a = 1.0 - shoulder
    return jnp.where(l <= a, l, a + shoulder * jnp.tanh((l - a) / jnp.maximum(shoulder, 1e-6)))


def _curve_reinhard(l):
    """Extended Reinhard (reference ToneMapper.Reinhard, :145)."""
    return l / (1.0 + l)


def _curve_aces(l):
    """ACES filmic approximation, Narkowicz 2015 (reference ToneMapper.ACES)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((l * (a * l + b)) / (l * (c * l + d) + e), 0.0, 1.0)


def _curve_hable(l):
    """Uncharted 2 filmic curve, Hable 2010 (reference ToneMapper.Hable)."""
    A, B, C, D, E, F = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    W = 11.2

    def f(x):
        return ((x * (A * x + C * B) + D * E) / (x * (A * x + B) + D * F)) - E / F

    return f(l) / f(W)


LUMINANCE_CURVES: dict[str, Callable] = {
    "pass_through": _curve_pass_through,
    "basic_shoulder": _curve_basic_shoulder,
    "reinhard": _curve_reinhard,
    "aces": _curve_aces,
    "hable": _curve_hable,
}


@dataclasses.dataclass
class ToneMapper:
    """Exposure/saturation grade + luminance curve applied chroma-
    preservingly (reference ToneMapper.cs: adjusts luminance, rescales RGB)."""

    layer: str = "main"
    curve: str = "aces"
    exposure: float = 1.0
    saturation: float = 1.0

    def apply(self, layers):
        img = layers[self.layer][..., :3] * self.exposure
        lum = colors.luminance(img)
        mapped = LUMINANCE_CURVES[self.curve](lum)
        ratio = (mapped / jnp.maximum(lum, 1e-8))[..., None]
        out = img * ratio
        if self.saturation != 1.0:
            grey = colors.luminance(out)[..., None]
            out = grey + (out - grey) * self.saturation
        layers[self.layer] = jnp.clip(out, 0.0, 1.0)
        return layers


@dataclasses.dataclass
class Vignette:
    """Radial darkening: multiplier = 1 - Sigmoid(dist * sqrt2) * intensity
    where dist is the uv distance from the image center and Sigmoid is the
    reference's clamped smoothstep (Vignette.cs:38, Curves.Sigmoid) — the
    corner distance maps to exactly 1. Optional deterministic film grain
    stays available as an extension (off by default, reference has none)."""

    layer: str = "main"
    intensity: float = 0.25
    grain: float = 0.0

    def apply(self, layers):
        img = layers[self.layer]
        h, w = img.shape[0], img.shape[1]
        y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h - 0.5
        x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 0.5
        dist = jnp.sqrt(x[None, :] ** 2 + y[:, None] ** 2) * jnp.sqrt(2.0)
        s = jnp.clip(dist, 0.0, 1.0)
        sig = 3.0 * s * s - 2.0 * s * s * s  # Curves.Sigmoid smoothstep
        falloff = 1.0 - sig * self.intensity
        if self.grain > 0.0:
            from ..utils.rng import hash_u32, u32_to_uniform

            pid = (jnp.arange(h * w, dtype=jnp.uint32)).reshape(h, w)
            noise = u32_to_uniform(hash_u32(pid, jnp.uint32(0x5EED))) - 0.5
            falloff = falloff + noise * self.grain * 2.0
        layers[self.layer] = img * falloff[..., None]
        return layers


@dataclasses.dataclass
class Watermark:
    """Stamp text over a blurred, brightness-shifted backdrop in a corner
    (reference Watermark.cs:18 + the bitmap Font glyphs)."""

    layer: str = "main"
    text: str = "echorenderer-tpu"
    scale: int = 2
    margin: int = 8
    opacity: float = 0.7

    def apply(self, layers):
        from ..io.font import render_text_mask

        img = layers[self.layer]
        h, w = img.shape[0], img.shape[1]
        mask_np = render_text_mask(self.text, scale=self.scale)
        th, tw = mask_np.shape
        if th + 2 * self.margin > h or tw + 2 * self.margin > w:
            return layers  # frame too small, skip (reference skips quietly)
        y0, x0 = self.margin, w - tw - self.margin  # bottom-right, y-up rows
        full = jnp.zeros((h, w), jnp.float32)
        full = jax.lax.dynamic_update_slice(full, jnp.asarray(mask_np), (y0, x0))
        backdrop_region = jnp.zeros((h, w), jnp.float32)
        backdrop_region = jax.lax.dynamic_update_slice(
            backdrop_region,
            jnp.ones((th + 2 * self.margin // 2, tw + 2 * self.margin // 2), jnp.float32),
            (y0 - self.margin // 2, x0 - self.margin // 2),
        )
        blurred = gaussian_blur(img, 2.0)
        region = backdrop_region[..., None]
        img = img * (1 - region) + (blurred * 0.7 + 0.08) * region
        tint = jnp.where(colors.luminance(blurred) > 0.5, 0.0, 1.0)[..., None]
        text_col = tint * full[..., None] * self.opacity
        layers[self.layer] = img * (1.0 - full[..., None] * self.opacity) + text_col
        return layers


@dataclasses.dataclass
class BilateralDenoise:
    """AOV-guided denoiser: cross-bilateral filter over the color layer
    guided by albedo + normal/depth AOVs — the TPU-native stand-in for the
    reference's Intel OIDN binding (OidnDenoise.cs:17, SURVEY.md §2b row 3).
    Same layer contract: color + albedo + normal_depth in, color out."""

    layer: str = "main"
    albedo_layer: str = "albedo"
    normal_layer: str = "normal_depth"
    radius: int = 4
    sigma_spatial: float = 2.0
    sigma_color: float = 0.35
    sigma_albedo: float = 0.12
    sigma_normal: float = 0.25

    def apply(self, layers):
        img = layers[self.layer]
        albedo = layers.get(self.albedo_layer)
        nd = layers.get(self.normal_layer)
        guide_n = nd[..., :3] if nd is not None else None
        lum = colors.luminance(img)

        acc = jnp.zeros_like(img)
        wsum = jnp.zeros(img.shape[:2], jnp.float32)
        r = self.radius
        inv2ss = 0.5 / (self.sigma_spatial**2)
        inv2sc = 0.5 / (self.sigma_color**2)
        inv2sa = 0.5 / (self.sigma_albedo**2)
        inv2sn = 0.5 / (self.sigma_normal**2)

        def shift(a, dy, dx):
            return jnp.roll(a, (dy, dx), axis=(0, 1))

        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                sample = shift(img, dy, dx)
                w = jnp.exp(-(dy * dy + dx * dx) * inv2ss)
                dl = colors.luminance(sample) - lum
                w = w * jnp.exp(-(dl * dl) * inv2sc)
                if albedo is not None:
                    da = jnp.sum((shift(albedo, dy, dx)[..., :3] - albedo[..., :3]) ** 2, -1)
                    w = w * jnp.exp(-da * inv2sa)
                if guide_n is not None:
                    dn = jnp.sum((shift(guide_n, dy, dx) - guide_n) ** 2, -1)
                    w = w * jnp.exp(-dn * inv2sn)
                acc = acc + sample * w[..., None]
                wsum = wsum + w
        layers[self.layer] = acc / jnp.maximum(wsum, 1e-8)[..., None]
        return layers


@dataclasses.dataclass
class LearnedDenoise:
    """Kernel-predicting CNN denoiser in the reference's OIDN slot
    (OidnDenoise.cs:17-230; weights committed, trained on this renderer's
    own renders — see processes/denoise.py and tools/train_denoiser.py).
    Same layer contract as BilateralDenoise: color + albedo + normal_depth
    in, color out. Falls back to the cross-bilateral filter when the AOVs
    or the committed weights are missing."""

    layer: str = "main"
    albedo_layer: str = "albedo"
    normal_layer: str = "normal_depth"

    def apply(self, layers):
        from . import denoise as dn

        img = layers[self.layer]
        albedo = layers.get(self.albedo_layer)
        nd = layers.get(self.normal_layer)
        params = dn.load_params()
        if albedo is None or nd is None or params is None:
            return BilateralDenoise(
                layer=self.layer,
                albedo_layer=self.albedo_layer,
                normal_layer=self.normal_layer,
            ).apply(layers)
        layers[self.layer] = dn.apply(
            params, img[None], albedo[None][..., :3], nd[None][..., :3]
        )[0]
        return layers


# ----------------------------------------------------------------------------
# stack execution
# ----------------------------------------------------------------------------


def compose(layers: dict, operators, jit: bool = True):
    """Run the operator stack over the layer dict. Returns (new_layers,
    errors) — per-operator errors are collected, not raised (reference
    CompositionOperation.cs error capture)."""
    errors = {}
    valid = []
    for op in operators:
        try:  # host-side validation happens eagerly
            if hasattr(op, "validate"):
                op.validate(layers)
            valid.append(op)
        except Exception as exc:  # noqa: BLE001
            errors[type(op).__name__] = str(exc)

    def run(ls):
        ls = dict(ls)
        for op in valid:
            ls = op.apply(ls)
        return ls

    jl = {k: jnp.asarray(v) for k, v in layers.items()}
    try:
        out = jax.jit(run)(jl) if jit else run(jl)
    except Exception as exc:  # noqa: BLE001 — fall back op-by-op to isolate
        out = jl
        for op in valid:
            try:
                out = op.apply(dict(out))
            except Exception as inner:  # noqa: BLE001
                errors[type(op).__name__] = str(inner)
    return out, errors


STANDARD_STACK = (
    BilateralDenoise(),
    AutoExposure(),
    Bloom(),
    ToneMapper(curve="aces"),
    Vignette(),
    Watermark(),
)
