"""Render orchestration: epochs, accumulation, adaptive termination.

Rebuild of the reference's process layer (Processes/): RenderProfile /
EvaluationProfile describe what to render (RenderProfile.cs:19,
EvaluationProfile.cs:13); `render` runs the epoch loop with per-pixel
Welford accumulation and adaptive noise-threshold termination
(EvaluationOperation.cs:83-148). Where the reference schedules tiles onto
a worker pool, here each epoch is one jitted whole-frame (or sharded)
device program; XLA replaces the Device/Operation machinery
(Common/Compute/Device.cs) and tiles exist only for progressive display.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..evaluation import integrators
from ..scene.cameras import spawn_rays
from ..scene.prepare import PreparedScene
from ..utils import accumulator as acc_mod
from ..utils.rng import SampleStream

EVALUATORS: dict[str, Callable] = {
    "path": integrators.path_trace,  # intercepted: wavefront regeneration
    "path_lockstep": integrators.path_trace,  # naive lockstep (A/B reference)
    "naive": integrators.naive_trace,
    "albedo": integrators.albedo,
    "normal_depth": integrators.normal_depth,
    "aggregator_quality": integrators.aggregator_quality,
}

AOV_CHANNELS = {
    "path": 3, "path_lockstep": 3, "naive": 3,
    "albedo": 3, "normal_depth": 4, "aggregator_quality": 3,
}


@dataclasses.dataclass
class EvaluationProfile:
    """What/how to evaluate one AOV layer (reference EvaluationProfile.cs)."""

    evaluator: str = "path"
    layer_name: str = "main"
    min_epoch: int = 1
    max_epoch: int = 20
    noise_threshold: float = 0.045
    samples_per_epoch: int = 16
    bounce_limit: int = 16
    survivability: float = 2.5


@dataclasses.dataclass
class RenderProfile:
    """A full render description (reference RenderProfile.cs)."""

    resolution: tuple = (960, 540)
    evaluations: tuple = (EvaluationProfile(),)
    composition: tuple = ()
    camera_name: str | None = None
    seed: int = 0
    scene: object = None  # optional Scene (set by the .echo DSL / CLI)


def standard_path_traced_profile(
    quality: float = 1.0,
    resolution: tuple = (960, 540),
    *,
    denoise: bool = True,
    watermark: bool = True,
) -> RenderProfile:
    """One-knob preset mirroring the reference StandardPathTracedProfile
    (StandardPathTracedProfile.cs:17-105): albedo + path + normal_depth
    evaluations, then denoise + postprocess composition. `quality` scales
    sample counts and adaptive epoch budget."""
    from .composition import (
        AutoExposure,
        BilateralDenoise,
        Bloom,
        ToneMapper,
        Vignette,
        Watermark,
    )

    spe = max(4, int(16 * quality))
    max_epoch = max(2, int(20 * quality))
    evaluations = (
        EvaluationProfile(evaluator="albedo", layer_name="albedo"),
        EvaluationProfile(
            evaluator="path",
            layer_name="main",
            samples_per_epoch=spe,
            min_epoch=1,
            max_epoch=max_epoch,
            noise_threshold=0.045 / max(quality, 0.25),
        ),
        EvaluationProfile(evaluator="normal_depth", layer_name="normal_depth"),
    )
    stack = []
    if denoise:
        stack.append(BilateralDenoise())
    stack += [AutoExposure(), Bloom(), ToneMapper(curve="aces"), Vignette()]
    if watermark:
        stack.append(Watermark())
    return RenderProfile(
        resolution=tuple(resolution), evaluations=evaluations, composition=tuple(stack)
    )


def _sample_frame(scene: PreparedScene, evaluator: str, resolution, seed, sample_start, count, bounce_limit, survivability):
    """Device program: accumulate `count` samples for every pixel.
    Returns (sum, sum_sq) of shape (H*W, C)."""
    width, height = resolution
    n = width * height
    channels = AOV_CHANNELS[evaluator]
    pixel_id = jnp.arange(n, dtype=jnp.uint32)
    px = (pixel_id % width).astype(jnp.int32)
    py = (pixel_id // width).astype(jnp.int32)
    pixel_xy = jnp.stack([px, py], axis=-1)

    if evaluator == "path":
        # the production integrator: wavefront with path regeneration.
        # CHAINS independent sample chains run per pixel in one wave —
        # wider waves amortize fixed per-iteration costs and shrink the
        # regeneration tail (fewer loop trips for the same sample count)
        from ..evaluation.wavefront import sample_frame_wavefront
        from ..ops import megakernel

        # CHAINS amortize the XLA wavefront's fixed per-iteration cost; the
        # fused megakernel has none, and chains shorten each lane's sample
        # run, which GROWS its per-block regeneration tail — so keep one
        # chain whenever the megakernel will take the frame
        chains = 1
        if not (jax.default_backend() == "tpu" and megakernel.supported(scene)):
            for k in (4, 2):
                if count % k == 0 and n * k <= 4_194_304:
                    chains = k
                    break
        rep = lambda a: jnp.tile(a, (chains,) + (1,) * (a.ndim - 1))
        chain = jnp.repeat(
            jnp.arange(chains, dtype=jnp.uint32) * (count // chains), n
        )
        s_sum, s_sq = sample_frame_wavefront(
            scene, rep(pixel_id), rep(pixel_xy), resolution,
            seed, jnp.asarray(sample_start, jnp.uint32) + chain, count // chains,
            bounce_limit=bounce_limit, survivability=survivability,
        )
        if chains > 1:
            s_sum = s_sum.reshape(chains, n, 3).sum(0)
            s_sq = s_sq.reshape(chains, n, 3).sum(0)
        return s_sum, s_sq

    fn = EVALUATORS[evaluator]

    def one_sample(i, carry):
        s_sum, s_sq = carry
        stream = SampleStream(
            pixel_id=pixel_id,
            sample_id=(sample_start + i).astype(jnp.uint32),
            seed=jnp.asarray(seed, jnp.uint32),
        )
        shift = stream.next_2d(0)
        lens = stream.next_2d(1)
        o, d = spawn_rays(scene.camera, pixel_xy, shift, lens, resolution)
        if evaluator == "path_lockstep":
            value = fn(scene, stream, o, d, bounce_limit=bounce_limit, survivability=survivability)
        elif evaluator == "naive":
            value = fn(scene, stream, o, d, bounce_limit=bounce_limit)
        else:
            value = fn(scene, stream, o, d)
        value = jnp.nan_to_num(value, nan=0.0, posinf=0.0, neginf=0.0) if evaluator in ("path_lockstep", "naive") else value
        return s_sum + value, s_sq + value * value

    init = (jnp.zeros((n, channels)), jnp.zeros((n, channels)))
    return jax.lax.fori_loop(0, count, one_sample, init)


_sample_frame_jit = jax.jit(
    _sample_frame,
    static_argnames=("evaluator", "resolution", "count", "bounce_limit", "survivability"),
)


def render_layer(
    scene: PreparedScene,
    profile: EvaluationProfile,
    resolution,
    seed: int = 0,
    progress: Callable | None = None,
):
    """Run the adaptive epoch loop for one layer. Returns (image (H, W, C),
    info dict with sample statistics)."""
    width, height = resolution
    n = width * height
    channels = AOV_CHANNELS[profile.evaluator]
    acc = acc_mod.create((n,), channels=channels)
    total_samples = 0
    start = time.perf_counter()

    for epoch in range(profile.max_epoch):
        s_sum, s_sq = _sample_frame_jit(
            scene,
            profile.evaluator,
            tuple(resolution),
            seed,
            jnp.asarray(epoch * profile.samples_per_epoch, jnp.uint32),
            profile.samples_per_epoch,
            profile.bounce_limit,
            profile.survivability,
        )
        k = jnp.full((n, 1), float(profile.samples_per_epoch))
        acc = acc_mod.add_many(acc, s_sum, s_sq, k)
        total_samples += profile.samples_per_epoch * n

        if profile.evaluator in ("albedo", "normal_depth", "aggregator_quality"):
            break  # deterministic AOVs need one epoch

        noise = float(jnp.max(acc_mod.max_noise(acc)))
        if progress:
            try:
                progress(
                    epoch + 1, profile.max_epoch, noise,
                    layer=profile.layer_name, samples=total_samples,
                    image=np.asarray(acc.mean).reshape(height, width, channels),
                )
            except TypeError:  # simpler callback signatures
                try:
                    progress(
                        epoch + 1, profile.max_epoch, noise,
                        layer=profile.layer_name, samples=total_samples,
                    )
                except TypeError:
                    progress(epoch + 1, profile.max_epoch, noise)
        if epoch + 1 >= profile.min_epoch and noise < profile.noise_threshold:
            break

    elapsed = time.perf_counter() - start
    image = np.asarray(acc.mean).reshape(height, width, channels)
    info = dict(
        samples=total_samples,
        epochs=epoch + 1,
        seconds=elapsed,
        samples_per_second=total_samples / max(elapsed, 1e-9),
    )
    return image, info


def render(scene: PreparedScene, profile: RenderProfile, progress=None):
    """Render all layers of a profile, then run the composition stack.
    Returns dict layer_name -> image, plus an info dict under '__info__'
    (reference ScheduledRender: evaluations then CompositionOperation)."""
    layers = {}
    infos = {}
    for ep in profile.evaluations:
        img, info = render_layer(scene, ep, profile.resolution, profile.seed, progress)
        layers[ep.layer_name] = img
        infos[ep.layer_name] = info
    if profile.composition:
        from .composition import compose

        composed, errors = compose(layers, profile.composition)
        layers = {k: np.asarray(v) for k, v in composed.items()}
        if errors:
            infos["composition_errors"] = errors
    layers["__info__"] = infos
    return layers
