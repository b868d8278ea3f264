"""Per-pixel Welford accumulator for adaptive Monte Carlo sampling.

Replaces the reference's `Accumulator` (Processes/Evaluation/Accumulator.cs):
online mean/variance per pixel, NaN/Inf sample rejection, and the relative
noise metric used for adaptive epoch termination. Stored as a pytree of
full-frame arrays so whole-frame accumulation is one fused XLA update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Accumulator(NamedTuple):
    mean: jax.Array  # (..., C) running mean
    m2: jax.Array  # (..., C) sum of squared deviations
    count: jax.Array  # (..., 1) number of accepted samples


def create(shape, channels: int = 3, dtype=jnp.float32) -> Accumulator:
    shape = tuple(shape)
    return Accumulator(
        mean=jnp.zeros(shape + (channels,), dtype),
        m2=jnp.zeros(shape + (channels,), dtype),
        count=jnp.zeros(shape + (1,), dtype),
    )


def add(acc: Accumulator, sample: jax.Array) -> Accumulator:
    """Add one sample per pixel. Non-finite samples are rejected
    (reference Accumulator.Add gates on float.IsFinite(sample.Sum))."""
    finite = jnp.isfinite(jnp.sum(sample, axis=-1, keepdims=True))
    count = acc.count + jnp.where(finite, 1.0, 0.0)
    safe_count = jnp.maximum(count, 1.0)
    delta = sample - acc.mean
    mean = acc.mean + jnp.where(finite, delta / safe_count, 0.0)
    m2 = acc.m2 + jnp.where(finite, delta * (sample - mean), 0.0)
    return Accumulator(mean=mean, m2=m2, count=count)


def add_many(acc: Accumulator, sample_sum: jax.Array, sample_sq_sum: jax.Array, n: jax.Array) -> Accumulator:
    """Merge a batch of n pre-reduced samples (sum and sum of squares) into
    the accumulator via Chan's parallel-Welford merge. Lets an epoch of many
    samples be reduced on-device before one accumulator update."""
    n = jnp.broadcast_to(n, acc.count.shape).astype(acc.count.dtype)
    nz = n > 0.0
    safe_n = jnp.maximum(n, 1.0)
    batch_mean = sample_sum / safe_n
    batch_m2 = sample_sq_sum - safe_n * batch_mean * batch_mean
    total = acc.count + n
    safe_total = jnp.maximum(total, 1.0)
    delta = batch_mean - acc.mean
    mean = acc.mean + jnp.where(nz, delta * (n / safe_total), 0.0)
    m2 = acc.m2 + jnp.where(
        nz, jnp.maximum(batch_m2, 0.0) + delta * delta * (acc.count * n / safe_total), 0.0
    )
    return Accumulator(mean=mean, m2=m2, count=total)


def variance(acc: Accumulator) -> jax.Array:
    """Unbiased sample variance (m2 itself when count < 3, matching the
    reference's `Variance` property)."""
    n = acc.count
    return jnp.where(n < 3.0, acc.m2, acc.m2 / jnp.maximum(n - 1.0, 1.0))


def noise(acc: Accumulator) -> jax.Array:
    """Relative remaining noise per channel, exactly the reference formula
    (Accumulator.cs:32-53): sqrt(m2 / ((count-1)^3 * mean^2)), zero where the
    mean is zero or count < 2."""
    n = acc.count
    one_less = jnp.maximum(n - 1.0, 1.0)
    numerator = acc.mean * acc.mean * (one_less**3)
    ratio = numerator / jnp.maximum(acc.m2, 1e-38)
    result = jax.lax.rsqrt(jnp.maximum(ratio, 1e-38))
    result = jnp.where(numerator > 0.0, result, 0.0)
    return jnp.where(n < 2.0, 0.0, result)


def max_noise(acc: Accumulator) -> jax.Array:
    """Max relative noise across channels, the adaptive-termination signal
    (reference EvaluationOperation.cs:137 uses accumulator.Noise.MaxComponent)."""
    return jnp.max(noise(acc), axis=-1)
