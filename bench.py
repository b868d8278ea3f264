"""Headline benchmark: path-tracing throughput in M samples (camera paths)
per second, the reference's SPPS metric (misc/performance.txt — the CPU
reference sustains ~10 M SPPS on 24 threads, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup over the reference's 10.3 M SPPS headline
(80-sphere scene, the same scene family rendered here).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_SPPS = 10.3e6  # reference: misc/performance.txt:14, 80 spheres


def main():
    from echorenderer_tpu.models import scenes
    from echorenderer_tpu.processes.render import _sample_frame_jit
    from echorenderer_tpu.scene.prepare import prepare_scene

    scene = prepare_scene(scenes.sphere_field(80))
    resolution = (960, 540)
    # per device program; large enough to amortize the wavefront's
    # regeneration tail (8 -> 26.7 Mspps, 64 -> 34.3) while staying ~1 s
    # per program, far under the device-time limit
    spp = 64
    bounce_limit = 16

    def run(start):
        s_sum, _ = _sample_frame_jit(
            scene, "path", resolution, 0, jnp.asarray(start, jnp.uint32), spp,
            bounce_limit, 2.5,
        )
        return s_sum

    run(0).block_until_ready()  # compile
    n_progs = 2
    t0 = time.perf_counter()
    for i in range(n_progs):
        out = run(spp * (i + 1))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    n_samples = resolution[0] * resolution[1] * spp * n_progs
    spps = n_samples / dt
    print(json.dumps({
        "metric": "path_samples_per_second",
        "value": round(spps / 1e6, 3),
        "unit": "Mspps",
        "vs_baseline": round(spps / BASELINE_SPPS, 3),
    }))


if __name__ == "__main__":
    main()
