"""Wavefront path tracing with path regeneration.

The TPU-native answer to the reference's megakernel-per-thread design
(SURVEY.md §7 'wavefront path tracer'; reference hot loop
PathTracedEvaluator.cs:57-147). The naive lockstep port (integrators.
path_trace) nests fori(samples) x while(bounces) and pays full lane width
for every bounce until the LAST straggler dies — measured ~16x the useful
work on open scenes. Here each lane owns one pixel and runs a continuous
stream of paths: the moment a lane's path terminates it accumulates into
the per-pixel Welford sums and immediately respawns the next sample's
camera ray in the same iteration, so every traversal/shading wave runs at
~full occupancy until the tail. Expected iterations ~ spp x mean path
length instead of spp x bounce_limit.

Per-lane determinism is unchanged: every random draw is a pure hash of
(seed, pixel, sample, bounce-dim) — regeneration reorders evaluation, not
the sample streams. Physics and draws live in the SHARED
integrators.path_step, so each sample's radiance is bit-identical to the
lockstep integrator's (tested in tests/test_integrators.py); only the
per-pixel accumulation order differs (and only across samples).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..scene.cameras import spawn_rays
from ..scene.prepare import PreparedScene
from ..utils.rng import SampleStream
from .integrators import path_step

# lane count from which the liveness cascade engages (below it the extra
# compiled loop bodies cost more than the width savings; CPU tests stay on
# the single full-width loop) and the narrowest stage width
WAVE_CASCADE_MIN = 2 ** 18
WAVE_CASCADE_FLOOR = 8192


def sample_frame_wavefront(
    scene: PreparedScene,
    pixel_id,  # (N,) uint32 absolute pixel ids (stable across sharding)
    pixel_xy,  # (N, 2) int32
    resolution,
    seed,
    sample_start,
    count: int,
    *,
    bounce_limit: int = 128,
    survivability: float = 2.5,
    enable_nee: bool = True,
    enable_fwd_mis: bool = True,
    return_stats: bool = False,
    sort_lanes: bool | None = None,  # None = auto (hier scenes on TPU)
):
    """Accumulate `count` path samples per pixel lane. Returns
    (sum, sum_sq) of shape (N, 3); with return_stats also a dict of named
    event counters — the device-side analogue of the reference's generated
    EvaluatorStatistics (Evaluation/Evaluators/EvaluatorStatistics.cs,
    labels in the reference's Report("...") style).
    The enable_* flags exist for ablation/debugging only."""
    # On TPU, scenes inside the megakernel envelope run the fully fused
    # Pallas wavefront (ops/megakernel.py): same draws, same physics, zero
    # HBM traffic between pipeline stages. Parity is pinned by
    # tests/test_megakernel.py.
    if (
        enable_nee
        and enable_fwd_mis
        and not return_stats
        and jax.default_backend() == "tpu"
    ):
        from ..ops import megakernel

        if megakernel.supported(scene):
            return megakernel.sample_frame_mega(
                scene, pixel_id, pixel_xy, resolution, seed, sample_start,
                count, bounce_limit=bounce_limit, survivability=survivability,
            )
        import os

        if megakernel.supported_hier(scene) and os.environ.get("ECHO_MEGA_HIER"):
            # fat-chunk hierarchical megakernel: correct (tested) but its
            # packet walk loses to the sorted XLA wavefront on incoherent
            # bounce rays (0.18 vs 0.4 Mspps on 250k tris) — opt-in for
            # coherence experiments until per-ray binned traversal lands
            return megakernel.sample_frame_mega(
                scene, pixel_id, pixel_xy, resolution, seed, sample_start,
                count, bounce_limit=bounce_limit, survivability=survivability,
                hier=True,
            )
    n = pixel_id.shape[0]
    f3 = lambda: jnp.zeros((n, 3), jnp.float32)

    # lane sorting (morton origin cell + direction octant, re-permuting the
    # whole wave each iteration): bitwise-invariant (every draw keys on
    # (pixel, sample, dim) and the pixel identity travels with the lane;
    # tested) but measured a net LOSS on real frames — 250k tris @ 960x540:
    # 0.33 vs 0.37 Mspps unsorted — because the tile-major camera order
    # already carries the packet coherence and bounce rays stay divergent
    # within any 1024-lane bucket at frame-sized waves. Standalone it
    # recovers 2.4x on uniformly random rays, so it stays available for the
    # planned binned-traversal wavefront; default off.
    sort_waves = bool(sort_lanes)

    # sample_start may be per-lane (chained runs, adaptive resumes): carry
    # it as lane state so the liveness cascade can compact it with the rest
    s0_lane = jnp.broadcast_to(
        jnp.asarray(sample_start, jnp.uint32), (n,)
    )

    def stream_lanes(pid, sample_id, s0):
        return SampleStream(
            pixel_id=pid,
            sample_id=s0 + sample_id,
            seed=jnp.asarray(seed, jnp.uint32),
        )

    def spawn(pid, pxy, sample_id, s0):
        s = stream_lanes(pid, sample_id, s0)
        o, d = spawn_rays(scene.camera, pxy, s.next_2d(0), s.next_2d(1), resolution)
        return o, d

    o0, d0 = spawn(pixel_id, pixel_xy, jnp.zeros((n,), jnp.uint32), s0_lane)

    state = dict(
        s_sum=f3(),
        s_sq=f3(),
        sample=jnp.zeros((n,), jnp.uint32),  # current sample index per lane
        lane_done=jnp.zeros((n,), bool),
        # lane identity (permuted together with the path state when sorting)
        pid=pixel_id,
        pxy=pixel_xy,
        s0=s0_lane,
        home=jnp.arange(n, dtype=jnp.int32),  # original lane slot
        # live path state
        radiance=f3(),
        throughput=jnp.ones((n, 3), jnp.float32),
        o=o0,
        d=d0,
        depth=jnp.zeros((n,), jnp.int32),
        prev_pdf=jnp.zeros((n,), jnp.float32),  # bsdf pdf of the ray's origin bounce
        prev_specular=jnp.ones((n,), bool),  # camera rays count as specular
        prev_point=o0,
        ignore=jnp.full((n,), -1, jnp.int32),
        ignore_inst=jnp.zeros((n,), jnp.int32),
        iters=jnp.zeros((), jnp.int32),
        # named event counters, summed across lanes (see `stats` below)
        counters=jnp.zeros((6,), jnp.float32),
    )

    def _morton10(v):
        """Interleave the low 9 bits of a uint32 into every third bit."""
        v = v & 0x1FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    def _sort_key(st):
        o, d = st["o"], st["d"]
        lo = jnp.min(jnp.where(st["lane_done"][:, None], jnp.inf, o), axis=0)
        hi = jnp.max(jnp.where(st["lane_done"][:, None], -jnp.inf, o), axis=0)
        q = jnp.clip(
            ((o - lo) / jnp.maximum(hi - lo, 1e-20) * 511.0), 0.0, 511.0
        ).astype(jnp.uint32)
        cell = (
            (_morton10(q[:, 0]) << 2) | (_morton10(q[:, 1]) << 1) | _morton10(q[:, 2])
        )
        octant = (
            (d[:, 0] > 0).astype(jnp.uint32) * 4
            + (d[:, 1] > 0).astype(jnp.uint32) * 2
            + (d[:, 2] > 0).astype(jnp.uint32)
        )
        key = (cell << 3) | octant
        # dead lanes cluster at the end: whole blocks go idle and the
        # kernel's occupancy gate skips them outright
        return jnp.where(st["lane_done"], jnp.uint32(0xFFFFFFFF), key)

    def _permute(st):
        order = jnp.argsort(_sort_key(st))
        out = {}
        for k, v in st.items():
            out[k] = v if k in ("iters", "counters") else v[order]
        return out

    def cond(st):
        return jnp.any(~st["lane_done"])

    def body(st, coherent=False):
        if sort_waves:
            st = _permute(st)
        live = ~st["lane_done"]
        stream = stream_lanes(st["pid"], st["sample"], st["s0"])

        # all physics (trace, MIS emission, NEE, bounce, RR) lives in the
        # shared path_step — bit-identical to the lockstep integrator
        out = path_step(
            scene, stream, st, live,
            bounce_limit=bounce_limit, survivability=survivability,
            enable_nee=enable_nee, enable_fwd_mis=enable_fwd_mis,
            coherent=coherent,
        )
        radiance = out["radiance"]
        new_tp = out["new_tp"]
        continues = out["continues"]
        aux = out["aux"]

        # --- regeneration: dead lanes bank the sample and respawn ---
        path_done = live & ~continues
        # non-finite samples rejected (reference Accumulator.cs:60-72)
        finite = jnp.isfinite(jnp.sum(radiance, axis=-1))
        bank = path_done & finite
        s_sum = st["s_sum"] + jnp.where(bank[..., None], radiance, 0.0)
        s_sq = st["s_sq"] + jnp.where(bank[..., None], radiance * radiance, 0.0)
        next_sample = st["sample"] + path_done.astype(jnp.uint32)
        lane_done = st["lane_done"] | (path_done & (next_sample >= count))
        respawn = path_done & ~lane_done

        cam_o, cam_d = spawn(st["pid"], st["pxy"], next_sample, st["s0"])
        sel = lambda m, a, b: jnp.where(m[..., None] if a.ndim > 1 else m, a, b)
        return dict(
            s_sum=s_sum,
            s_sq=s_sq,
            sample=next_sample,
            lane_done=lane_done,
            pid=st["pid"],
            pxy=st["pxy"],
            s0=st["s0"],
            home=st["home"],
            radiance=sel(respawn, jnp.zeros_like(radiance), radiance),
            throughput=sel(respawn, jnp.ones_like(new_tp), new_tp),
            o=sel(respawn, cam_o, out["cont_o"]),
            d=sel(respawn, cam_d, out["wi_world"]),
            depth=jnp.where(respawn, 0, st["depth"] + 1),
            prev_pdf=jnp.where(respawn, 0.0, out["bs_pdf"]),
            prev_specular=jnp.where(respawn, True, out["bs_specular"]),
            prev_point=sel(respawn, cam_o, out["contact_point"]),
            ignore=jnp.where(respawn, -1, out["hit_prim"]),
            ignore_inst=jnp.where(respawn, 0, out["hit_inst"]),
            iters=st["iters"] + 1,
            counters=st["counters"]
            + jnp.stack(
                [
                    jnp.sum(live.astype(jnp.float32)),  # Ray/Traced
                    jnp.sum(aux["candidate"].astype(jnp.float32)),  # Ray/Shadow
                    jnp.sum(bank.astype(jnp.float32)),  # Sample/Completed
                    jnp.sum((path_done & ~finite).astype(jnp.float32)),  # Sample/Rejected
                    jnp.sum(aux["found"].astype(jnp.float32)),  # Bounce/Created
                    jnp.sum(
                        (aux["has_bounce"] & ~aux["survived"]).astype(jnp.float32)
                    ),  # Path/RRKilled
                ]
            ),
        )

    # --- liveness cascade (r4): as paths terminate without respawning
    # (sample budgets exhausted), live lanes thin out but every iteration
    # still pays FULL-width traversal — the 1M-tri 1080p bench at spp=1
    # spent 7 iterations at 2M lanes with live fractions ~1.0 -> ~0.01
    # (xprof, benchmarks/e2e_profile.py). Once the live count drops below
    # a stage width, compact the live lanes into a dense prefix (argsort
    # by lane_done — a pure permutation; every draw keys on (pixel,
    # sample, dim) so per-sample radiance is bitwise unchanged) and keep
    # looping at the narrower static width. Results scatter back at stage
    # end. Same pattern as the binned traversal's straggler cascade.
    def live_count(st):
        return jnp.sum((~st["lane_done"]).astype(jnp.int32))

    # iteration 0 is peeled out of the loop: every lane is at (relative
    # sample 0, depth 0) — the full tile-major camera wave — so its trace
    # and NEE-shadow wave take the coherent packet-walk dispatch
    # (scene_ops.trace/occlude coherent=True). Later iterations mix
    # respawned camera rays with bounce rays and stay on the binned path.
    # The lockstep integrator peels the SAME (sample 0, bounce 0)
    # population (integrators.path_trace first_wave_coherent), keeping
    # per-sample sums bitwise-identical across integrators.
    if count >= 1:
        state = body(state, coherent=True)

    widths = []
    if not sort_waves and n >= WAVE_CASCADE_MIN:
        w = n
        while True:
            w = -(-(w // 4) // 1024) * 1024
            if w < max(WAVE_CASCADE_FLOOR, n // 64) or (
                widths and w >= widths[-1]
            ) or w >= n:
                break
            widths.append(w)
    if not widths:
        state = jax.lax.while_loop(cond, body, state)
    else:
        st = jax.lax.while_loop(
            lambda s: live_count(s) > widths[0], body, state
        )
        per_lane = [k for k, v in st.items()
                    if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == n]
        for i, width in enumerate(widths):
            floor = widths[i + 1] if i + 1 < len(widths) else 0
            perm = jnp.argsort(st["lane_done"])  # live lanes first
            take = perm[:width]
            sub = {
                k: (v[take] if k in per_lane else v) for k, v in st.items()
            }
            sub = jax.lax.while_loop(
                lambda s: live_count(s) > floor, body, sub
            )
            # bank the narrow stage's per-lane results; untaken lanes were
            # all done and keep their accumulated sums
            out = dict(st)
            for k in per_lane:
                out[k] = st[k].at[take].set(sub[k])
            out["iters"] = sub["iters"]
            out["counters"] = sub["counters"]
            st = out
        state = st

    if sort_waves:  # un-permute: each lane's sums back to its input slot
        inv = jnp.zeros((n,), jnp.int32).at[state["home"]].set(jnp.arange(n, dtype=jnp.int32))
        state["s_sum"] = state["s_sum"][inv]
        state["s_sq"] = state["s_sq"][inv]
    if return_stats:
        stats = dict(
            zip(
                [
                    "Ray/Traced", "Ray/Shadow", "Sample/Completed",
                    "Sample/Rejected", "Bounce/Created", "Path/RRKilled",
                ],
                state["counters"],
            )
        )
        stats["Loop/Iterations"] = state["iters"]
        return state["s_sum"], state["s_sq"], stats
    return state["s_sum"], state["s_sq"]
