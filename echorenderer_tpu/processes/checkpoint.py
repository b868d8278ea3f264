"""Render checkpoint/resume: accumulator-state snapshots.

The reference has no render-state checkpointing — only pause/resume of a
live operation and the lossless `.fpi` image format (SURVEY.md §5,
Common/Compute/Device.cs pause, InOut/Images/FpiSerializer.cs). Because
this renderer's whole mutable state is the per-pixel Welford accumulator
(mean, m2, count) plus the epoch counter, snapshotting it makes renders
fully resumable across process restarts — a first-class feature here.

Format: a single .npz with the accumulator arrays + metadata; pairs with
the deterministic sample streams so a resumed render produces the SAME
image as an uninterrupted one (continuation draws sample_id where it left
off)."""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..utils.accumulator import Accumulator

FORMAT_VERSION = 1


def save_checkpoint(path, acc: Accumulator, *, epoch: int, layer: str = "main",
                    seed: int = 0, resolution=None, extra: dict | None = None):
    """Snapshot an accumulator + loop position to `path` (.npz)."""
    meta = dict(
        version=FORMAT_VERSION,
        epoch=int(epoch),
        layer=layer,
        seed=int(seed),
        resolution=list(resolution) if resolution else None,
        **(extra or {}),
    )
    np.savez_compressed(
        Path(path),
        mean=np.asarray(acc.mean),
        m2=np.asarray(acc.m2),
        count=np.asarray(acc.count),
        meta=json.dumps(meta),
    )


def load_checkpoint(path) -> tuple[Accumulator, dict]:
    """Load a snapshot -> (Accumulator on device, metadata dict)."""
    with np.load(Path(path), allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("version") != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta.get('version')}")
        acc = Accumulator(
            mean=jnp.asarray(z["mean"]),
            m2=jnp.asarray(z["m2"]),
            count=jnp.asarray(z["count"]),
        )
    return acc, meta


def resume_render_layer(scene, profile, resolution, checkpoint_path, *,
                        seed: int = 0, progress=None, save_every: int = 0):
    """render_layer with persistence: resumes from `checkpoint_path` if it
    exists; optionally writes a snapshot every `save_every` epochs."""
    import time

    from ..utils import accumulator as acc_mod
    from .render import AOV_CHANNELS, _sample_frame_jit

    width, height = resolution
    n = width * height
    channels = AOV_CHANNELS[profile.evaluator]
    start_epoch = 0
    path = Path(checkpoint_path)
    if path.exists():
        acc, meta = load_checkpoint(path)
        if meta.get("resolution") and tuple(meta["resolution"]) != tuple(resolution):
            raise ValueError("checkpoint resolution mismatch")
        start_epoch = meta["epoch"]
        seed = meta.get("seed", seed)
    else:
        acc = acc_mod.create((n,), channels=channels)

    t0 = time.perf_counter()
    total = int(float(jnp.sum(acc.count[..., 0])))
    epoch = start_epoch
    ran_epochs = False
    for epoch in range(start_epoch, profile.max_epoch):
        ran_epochs = True
        s_sum, s_sq = _sample_frame_jit(
            scene, profile.evaluator, tuple(resolution), seed,
            jnp.asarray(epoch * profile.samples_per_epoch, jnp.uint32),
            profile.samples_per_epoch, profile.bounce_limit, profile.survivability,
        )
        k = jnp.full((n, 1), float(profile.samples_per_epoch))
        acc = acc_mod.add_many(acc, s_sum, s_sq, k)
        total += profile.samples_per_epoch * n
        noise = float(jnp.max(acc_mod.max_noise(acc)))
        if progress:
            progress(epoch + 1, profile.max_epoch, noise)
        if save_every and (epoch + 1) % save_every == 0:
            save_checkpoint(path, acc, epoch=epoch + 1, layer=profile.layer_name,
                            seed=seed, resolution=resolution)
        if epoch + 1 >= profile.min_epoch and noise < profile.noise_threshold:
            break

    # only persist when work actually ran: resuming an already-complete
    # checkpoint must not inflate the epoch counter (a phantom epoch would
    # silently skip its sample_id range if max_epoch is later raised,
    # breaking the resumed == uninterrupted determinism contract)
    epochs_done = epoch + 1 if ran_epochs else start_epoch
    if ran_epochs:
        save_checkpoint(path, acc, epoch=epochs_done, layer=profile.layer_name,
                        seed=seed, resolution=resolution)
    image = np.asarray(acc.mean).reshape(height, width, channels)
    info = dict(samples=total, epochs=epochs_done, seconds=time.perf_counter() - t0)
    return image, info
