"""Color math on (..., 3) / (..., 4) float32 arrays.

Replaces the reference's 128-bit color structs (Textures/Colors/RGB128.cs,
RGBA128.cs, RGBA128.Parser.cs). Colors are linear-space RGB; alpha is an
optional trailing channel.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

# radiance weights from reference RGB128 (Textures/Colors/RGB128.cs:30-32)
LUMINANCE_WEIGHTS = jnp.asarray([0.212671, 0.715160, 0.072169], dtype=jnp.float32)

WHITE = jnp.ones(3, dtype=jnp.float32)
BLACK = jnp.zeros(3, dtype=jnp.float32)


def luminance(rgb: jax.Array) -> jax.Array:
    return jnp.sum(rgb[..., :3] * LUMINANCE_WEIGHTS, axis=-1)


def srgb_encode(linear: jax.Array) -> jax.Array:
    """Linear -> sRGB gamma."""
    l = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(l <= 0.0031308, 12.92 * l, 1.055 * jnp.power(l, 1.0 / 2.4) - 0.055)


def srgb_decode(srgb: jax.Array) -> jax.Array:
    """sRGB gamma -> linear."""
    s = jnp.clip(srgb, 0.0, 1.0)
    return jnp.where(s <= 0.04045, s / 12.92, jnp.power((s + 0.055) / 1.055, 2.4))


# prefixes per the reference parser: 0x, # (doubled # tolerated), or bare
_HEX_RE = re.compile(r"^(?:0[xX]|##?)?([0-9a-fA-F]{1,8})$")


def parse_color(text: str) -> np.ndarray:
    """Parse a color literal into linear RGBA float32.

    Supports the reference RGBA128 parser forms (Textures/Colors/RGBA128.Parser.cs):
    hex (`#FF00FF`, `#F0F`, with optional alpha), `rgb(r, g, b[, a])` with
    0-255 components, and `hdr(r, g, b[, a])` with raw float components.
    """
    text = text.strip()
    m = _HEX_RE.match(text)
    if m:
        h = m.group(1)
        # reference hex forms (RGBA128.Parser.cs ParseHex): 1 = gray nibble,
        # 3/4 = rgb(a) nibbles, 6/8 = rgb(a) bytes
        if len(h) == 1:
            h = h * 6
        elif len(h) in (3, 4):
            h = "".join(c * 2 for c in h)
        if len(h) == 6:
            h += "FF"
        if len(h) != 8:
            raise ValueError(f"bad hex color {text!r}")
        vals = np.array([int(h[i : i + 2], 16) / 255.0 for i in range(0, 8, 2)])
        rgb = _srgb_decode_np(vals[:3])
        return np.append(rgb, vals[3]).astype(np.float32)

    for prefix, scale, gamma in (("rgb", 255.0, True), ("hdr", 1.0, False)):
        if text.lower().startswith(prefix):
            inner = text[len(prefix) :].strip()
            if inner.startswith("(") and inner.endswith(")"):
                inner = inner[1:-1]
            parts = [float(p) for p in inner.replace(",", " ").split()]
            if len(parts) == 1:
                parts = parts * 3
            if len(parts) == 3:
                parts.append(scale if gamma else 1.0)
            vals = np.array(parts, dtype=np.float64) / scale
            if gamma:
                vals[:3] = _srgb_decode_np(vals[:3])
            return vals.astype(np.float32)

    raise ValueError(f"unrecognized color literal {text!r}")


def _srgb_decode_np(s: np.ndarray) -> np.ndarray:
    s = np.clip(s, 0.0, 1.0)
    return np.where(s <= 0.04045, s / 12.92, ((s + 0.055) / 1.055) ** 2.4)
