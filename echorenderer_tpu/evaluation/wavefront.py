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
the sample streams, so the image is bit-comparable to the lockstep
integrator's estimator (same draws, same arithmetic order per sample
up to float addition order of the per-pixel accumulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.intersect import INF
from ..scene.cameras import spawn_rays
from ..scene.prepare import LIGHT_AMBIENT, PreparedScene
from ..utils import colors, vec
from ..utils.rng import SampleStream
from . import bsdf as bsdf_mod
from . import scene_ops
from .integrators import (
    BOUNCE_DIM_STRIDE,
    DIM_BSDF,
    DIM_LIGHT_PICK,
    DIM_LIGHT_SAMPLE,
    DIM_LOBE,
    DIM_RR,
    _offset_origin,
    _power_heuristic,
)


def sample_frame_wavefront(
    scene: PreparedScene,
    pixel_id,  # (N,) uint32 absolute pixel ids (stable across sharding)
    pixel_xy,  # (N, 2) int32
    resolution,
    seed,
    sample_start,
    count: int,
    *,
    bounce_limit: int = 16,
    survivability: float = 2.5,
    enable_nee: bool = True,
    enable_fwd_mis: bool = True,
    return_stats: bool = False,
):
    """Accumulate `count` path samples per pixel lane. Returns
    (sum, sum_sq) of shape (N, 3); with return_stats also a dict of named
    event counters — the device-side analogue of the reference's generated
    EvaluatorStatistics (Evaluation/Evaluators/EvaluatorStatistics.cs,
    labels in the reference's Report("...") style).
    The enable_* flags exist for ablation/debugging only."""
    n = pixel_id.shape[0]
    f3 = lambda: jnp.zeros((n, 3), jnp.float32)

    def stream_for(sample_id):
        return SampleStream(
            pixel_id=pixel_id,
            sample_id=sample_start + sample_id,
            seed=jnp.asarray(seed, jnp.uint32),
        )

    def spawn(sample_id):
        s = stream_for(sample_id)
        o, d = spawn_rays(scene.camera, pixel_xy, s.next_2d(0), s.next_2d(1), resolution)
        return o, d

    o0, d0 = spawn(jnp.zeros((n,), jnp.uint32))

    state = dict(
        s_sum=f3(),
        s_sq=f3(),
        sample=jnp.zeros((n,), jnp.uint32),  # current sample index per lane
        lane_done=jnp.zeros((n,), bool),
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
        iters=jnp.zeros((), jnp.int32),
        # named event counters, summed across lanes (see `stats` below)
        counters=jnp.zeros((6,), jnp.float32),
    )

    def cond(st):
        return jnp.any(~st["lane_done"])

    def body(st):
        live = ~st["lane_done"]
        stream = stream_for(st["sample"])

        # --- trace the pending ray (advance) ---
        seg_t = jnp.where(live, INF, 0.0)
        hit = scene_ops.trace(scene, st["o"], st["d"], seg_t, st["ignore"])
        found = live & hit.found
        contact = scene_ops.interact(scene, hit, st["o"], st["d"])

        # --- emission at the hit, MIS-weighted against NEE ---
        emitted = scene_ops.emission_at(scene, contact, -st["d"])
        if enable_fwd_mis and enable_nee:
            hit_light = vec.small_table_lookup(
                scene.lights.prim_light, jnp.maximum(hit.prim, 0)
            )
            light_pm = scene_ops.light_pmf(scene, hit_light, st["prev_point"])
            fwd_pdf = light_pm * scene_ops.area_light_pdf(
                scene, hit.prim, st["prev_point"], contact.point, contact.geo_normal, st["d"]
            )
            em_w = jnp.where(
                st["prev_specular"], 1.0, _power_heuristic(st["prev_pdf"], fwd_pdf)
            )
        else:
            em_w = jnp.ones((hit.prim.shape[0],), jnp.float32)
        radiance = st["radiance"] + jnp.where(
            found[..., None], st["throughput"] * emitted * em_w[..., None], 0.0
        )

        # --- miss: infinite lights, MIS against ambient NEE ---
        amb_records = scene.lights.kind == LIGHT_AMBIENT
        amb_pmf = jnp.sum(jnp.where(amb_records, scene.lights.power, 0.0)) / jnp.maximum(
            jnp.sum(scene.lights.power), 1e-20
        )
        inf_pdf = amb_pmf * scene_ops.env_pdf(scene, st["d"])
        inf_w = jnp.where(st["prev_specular"], 1.0, _power_heuristic(st["prev_pdf"], inf_pdf))
        escaped = live & ~hit.found
        is_camera = st["depth"] == 0
        radiance += jnp.where(
            escaped[..., None],
            st["throughput"]
            * jnp.where(
                is_camera[..., None],
                scene_ops.eval_infinite(scene, st["d"], True),
                scene_ops.eval_infinite(scene, st["d"], False) * inf_w[..., None],
            ),
            0.0,
        )

        # --- shade the found lanes: NEE + BSDF bounce ---
        wo = -st["d"]
        tangent, bitangent = vec.orthonormal_frame(contact.shade_normal)
        wo_local = vec.to_local(wo, tangent, bitangent, contact.shade_normal)
        # every draw comes from the low-discrepancy R2 stream keyed by
        # (pixel, sample, bounce-dim): stratification at EVERY bounce (the
        # reference stratifies all dims of a sample too) and exactly one
        # hash per draw — half the cost of a dual stratified/white scheme
        dim = BOUNCE_DIM_STRIDE * st["depth"]
        u_bsdf = stream.next_2d(dim + DIM_BSDF)
        u_lobe = stream.next_1d(dim + DIM_LOBE)
        u_pick = stream.next_1d(dim + DIM_LIGHT_PICK)
        u_light = stream.next_2d(dim + DIM_LIGHT_SAMPLE)
        u_rr = stream.next_1d(dim + DIM_RR)

        bs = bsdf_mod.sample(contact.material, wo_local, u_bsdf, u_lobe)
        cos_i = jnp.abs(bs.incident[..., 2])
        has_bounce = found & (bs.pdf > 0.0) & (st["depth"] < bounce_limit)

        # NEE
        if enable_nee:
            do_nee = found & ~bs.specular
            record, pick_pmf = scene_ops.pick_light(scene, u_pick, contact.point)
            ls = scene_ops.sample_light(scene, record, contact.point, u_light)
            wi_l = vec.to_local(ls.incident, tangent, bitangent, contact.shade_normal)
            f_l = bsdf_mod.evaluate(contact.material, wo_local, wi_l)
            f_l = f_l * jnp.abs(vec.dot(contact.shade_normal, ls.incident))[..., None]
            nee_pdf = pick_pmf * ls.pdf
            candidate = do_nee & (nee_pdf > 1e-12) & jnp.any(f_l * ls.radiant > 0.0, axis=-1)
            shadow_o = _offset_origin(contact.point, contact.geo_normal, ls.incident)
            shadow_t = jnp.where(ls.travel >= INF, INF, ls.travel * (1.0 - 1e-3))
            shadow_t = jnp.where(candidate, shadow_t, 0.0)
            blocked = scene_ops.occlude(
                scene, shadow_o, ls.incident, shadow_t, jnp.maximum(hit.prim, 0)
            )
            visible = candidate & ~blocked
            scatter_pdf_l = bsdf_mod.pdf(contact.material, wo_local, wi_l)
            mis_w = jnp.where(ls.use_mis, _power_heuristic(nee_pdf, scatter_pdf_l), 1.0)
            nee = ls.radiant * f_l * (mis_w / jnp.maximum(nee_pdf, 1e-20))[..., None]
            radiance += jnp.where(visible[..., None], st["throughput"] * nee, 0.0)

        # continue or die (Russian roulette, PathTracedEvaluator.cs:313-320)
        weight = bs.value * (cos_i / jnp.maximum(bs.pdf, 1e-20))[..., None]
        new_tp = st["throughput"] * jnp.where(has_bounce[..., None], weight, 1.0)
        rr = jnp.clip(survivability * colors.luminance(new_tp), 0.0, 1.0)
        survived = u_rr < rr
        new_tp = new_tp / jnp.maximum(rr, 1e-20)[..., None]
        continues = has_bounce & survived

        wi_world = vec.to_world(bs.incident, tangent, bitangent, contact.shade_normal)
        cont_o = _offset_origin(contact.point, contact.geo_normal, wi_world)

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

        cam_o, cam_d = spawn(next_sample)
        sel = lambda m, a, b: jnp.where(m[..., None] if a.ndim > 1 else m, a, b)
        return dict(
            s_sum=s_sum,
            s_sq=s_sq,
            sample=next_sample,
            lane_done=lane_done,
            radiance=sel(respawn, jnp.zeros_like(radiance), radiance),
            throughput=sel(respawn, jnp.ones_like(new_tp), new_tp),
            o=sel(respawn, cam_o, cont_o),
            d=sel(respawn, cam_d, wi_world),
            depth=jnp.where(respawn, 0, st["depth"] + 1),
            prev_pdf=jnp.where(respawn, 0.0, bs.pdf),
            prev_specular=jnp.where(respawn, True, bs.specular),
            prev_point=sel(respawn, cam_o, contact.point),
            ignore=jnp.where(respawn, -1, jnp.maximum(hit.prim, 0)),
            iters=st["iters"] + 1,
            counters=st["counters"]
            + jnp.stack(
                [
                    jnp.sum(live.astype(jnp.float32)),  # Ray/Traced
                    jnp.sum(candidate.astype(jnp.float32))
                    if enable_nee
                    else 0.0,  # Ray/Shadow
                    jnp.sum(bank.astype(jnp.float32)),  # Sample/Completed
                    jnp.sum((path_done & ~finite).astype(jnp.float32)),  # Sample/Rejected
                    jnp.sum(found.astype(jnp.float32)),  # Bounce/Created
                    jnp.sum((has_bounce & ~survived).astype(jnp.float32)),  # Path/RRKilled
                ]
            ),
        )

    state = jax.lax.while_loop(cond, body, state)
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
