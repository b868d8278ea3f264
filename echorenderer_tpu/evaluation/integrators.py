"""Integrators ("Evaluators"): per-ray radiance estimators.

Rebuild of the reference evaluator family (Evaluation/Evaluators/):
  - path_trace: the main unidirectional path tracer with NEE + power
    heuristic MIS + Russian roulette (PathTracedEvaluator.cs:26-147)
  - naive_trace: brute-force reference integrator without NEE
    (StandardNaiveEvaluator.cs), used to validate the MIS machinery
  - albedo / normal_depth: auxiliary AOV evaluators
    (AlbedoEvaluator.cs, NormalDepthEvaluator.cs)

Where the reference runs one path per CPU thread to completion, here all
lanes advance through the bounce loop in lockstep under active masks
(wavefront form). Per-lane sample streams stay deterministic, so the image
is identical regardless of batching or sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.intersect import INF
from ..scene.prepare import LIGHT_AMBIENT, PreparedScene
from ..utils import colors, vec
from ..utils.rng import SampleStream
from . import bsdf as bsdf_mod
from . import scene_ops

# dimension indices for the deterministic sample streams; bounce b uses
# white-noise dims keyed by (BOUNCE_DIM_STRIDE * b + offset)
DIM_BSDF = 0
DIM_LOBE = 1
DIM_LIGHT_PICK = 2
DIM_LIGHT_SAMPLE = 3
DIM_RR = 4
BOUNCE_DIM_STRIDE = 8
# first-bounce draws use low-discrepancy stratified dims (static)
STRAT_BSDF = 2
STRAT_LOBE = 3
STRAT_LIGHT_PICK = 4
STRAT_LIGHT_SAMPLE = 5


def _power_heuristic(pdf0, pdf1):
    """Veach power heuristic, exponent 2 (PathTracedEvaluator.cs:213)."""
    sq = pdf0 * pdf0
    return sq / jnp.maximum(sq + pdf1 * pdf1, 1e-20)


def _offset_origin(point, geo_normal, direction):
    """Offset a spawned ray origin along the geometric normal to avoid
    self-intersection (reference Contact.SpawnTrace offset)."""
    side = jnp.sign(vec.dot(geo_normal, direction))[..., None]
    return point + geo_normal * side * 1e-4


def path_trace(
    scene: PreparedScene,
    stream: SampleStream,
    origin,
    direction,
    *,
    bounce_limit: int = 16,
    survivability: float = 2.5,
):
    """Estimate radiance along camera rays. Returns (radiance (N, 3))."""
    n = origin.shape[0]

    hit = scene_ops.trace(scene, origin, direction, INF, jnp.full((n,), -1, jnp.int32))
    radiance = jnp.where(
        (~hit.found)[..., None],
        scene_ops.eval_infinite(scene, direction, True),
        0.0,
    )
    throughput = jnp.ones((n, 3), jnp.float32)
    active = hit.found

    # first-hit emission at full weight (reference: path.ContributeEmissive())
    contact0 = scene_ops.interact(scene, hit, origin, direction)
    radiance += jnp.where(
        active[..., None],
        throughput * scene_ops.emission_at(scene, contact0, -direction),
        0.0,
    )

    def body(depth, state):
        radiance, throughput, active, o, d, hit = state
        contact = scene_ops.interact(scene, hit, o, d)
        wo = -d
        tangent, bitangent = vec.orthonormal_frame(contact.shade_normal)
        wo_local = vec.to_local(wo, tangent, bitangent, contact.shade_normal)

        is_first = depth == 0
        dim = BOUNCE_DIM_STRIDE * depth

        def draw1(strat_dim, white_off):
            sw = stream.white_1d(dim + white_off)
            ss = stream.next_1d(strat_dim)
            return jnp.where(is_first, ss, sw)

        def draw2(strat_dim, white_off):
            sw = stream.white_2d(dim + white_off)
            ss = stream.next_2d(strat_dim)
            return jnp.where(is_first, ss, sw)

        u_bsdf = draw2(STRAT_BSDF, DIM_BSDF)
        u_lobe = draw1(STRAT_LOBE, DIM_LOBE)
        u_pick = draw1(STRAT_LIGHT_PICK, DIM_LIGHT_PICK)
        u_light = draw2(STRAT_LIGHT_SAMPLE, DIM_LIGHT_SAMPLE)
        u_rr = stream.white_1d(dim + DIM_RR)

        # --- sample the BSDF (reference `Bounce`) ---
        bs = bsdf_mod.sample(contact.material, wo_local, u_bsdf, u_lobe)
        cos_i = jnp.abs(bs.incident[..., 2])
        has_bounce = active & (bs.pdf > 0.0)

        # --- next event estimation (skipped for specular bounces) ---
        do_nee = active & ~bs.specular
        record, pick_pmf = scene_ops.pick_light(scene, u_pick, contact.point)
        ls = scene_ops.sample_light(scene, record, contact.point, u_light)
        wi_l_local = vec.to_local(ls.incident, tangent, bitangent, contact.shade_normal)
        f_l = bsdf_mod.evaluate(contact.material, wo_local, wi_l_local)
        f_l = f_l * jnp.abs(vec.dot(contact.shade_normal, ls.incident))[..., None]
        nee_pdf = pick_pmf * ls.pdf
        candidate = do_nee & (nee_pdf > 1e-12) & jnp.any(f_l * ls.radiant > 0.0, axis=-1)

        shadow_o = _offset_origin(contact.point, contact.geo_normal, ls.incident)
        shadow_t = jnp.where(ls.travel >= INF, INF, ls.travel * (1.0 - 1e-3))
        # inactive lanes get a zero-length ray to keep traversal cheap
        shadow_t = jnp.where(candidate, shadow_t, 0.0)
        blocked = scene_ops.occlude(
            scene, shadow_o, ls.incident, shadow_t, jnp.maximum(hit.prim, 0)
        )
        visible = candidate & ~blocked

        scatter_pdf_l = bsdf_mod.pdf(contact.material, wo_local, wi_l_local)
        mis_w = jnp.where(
            ls.use_mis, _power_heuristic(nee_pdf, scatter_pdf_l), 1.0
        )
        nee = ls.radiant * f_l * (mis_w / jnp.maximum(nee_pdf, 1e-20))[..., None]
        radiance += jnp.where(visible[..., None], throughput * nee, 0.0)

        # --- continue the path (reference Path.Continue) ---
        weight = bs.value * (cos_i / jnp.maximum(bs.pdf, 1e-20))[..., None]
        new_throughput = throughput * jnp.where(has_bounce[..., None], weight, 1.0)
        rr_rate = jnp.clip(survivability * colors.luminance(new_throughput), 0.0, 1.0)
        survived = u_rr < rr_rate
        new_throughput = new_throughput / jnp.maximum(rr_rate, 1e-20)[..., None]
        active_next = has_bounce & survived

        wi_world = vec.to_world(bs.incident, tangent, bitangent, contact.shade_normal)
        new_o = _offset_origin(contact.point, contact.geo_normal, wi_world)
        new_d = wi_world

        # --- advance (trace next segment) ---
        seg_t = jnp.where(active_next, INF, 0.0)
        new_hit = scene_ops.trace(scene, new_o, new_d, seg_t, jnp.maximum(hit.prim, 0))
        next_found = active_next & new_hit.found

        # forward-hit emission with MIS (reference ContributeEmissive(PowerHeuristic))
        new_contact = scene_ops.interact(scene, new_hit, new_o, new_d)
        emitted = scene_ops.emission_at(scene, new_contact, -new_d)
        hit_light = scene.lights.prim_light[jnp.maximum(new_hit.prim, 0)]
        light_pm = scene_ops.light_pmf(scene, hit_light, contact.point)
        fwd_pdf = light_pm * scene_ops.area_light_pdf(
            scene, new_hit.prim, contact.point, new_contact.point, new_contact.geo_normal, new_d
        )
        em_weight = jnp.where(bs.specular, 1.0, _power_heuristic(bs.pdf, fwd_pdf))
        radiance += jnp.where(
            next_found[..., None], new_throughput * emitted * em_weight[..., None], 0.0
        )

        # forward-miss: infinite lights with MIS against ambient sampling
        amb_records = scene.lights.kind == LIGHT_AMBIENT
        amb_pmf = jnp.sum(jnp.where(amb_records, scene.lights.power, 0.0)) / jnp.maximum(
            jnp.sum(scene.lights.power), 1e-20
        )
        inf_pdf = amb_pmf * scene_ops.env_pdf(scene, new_d)
        inf_weight = jnp.where(bs.specular, 1.0, _power_heuristic(bs.pdf, inf_pdf))
        escaped = active_next & ~new_hit.found
        radiance += jnp.where(
            escaped[..., None],
            new_throughput
            * scene_ops.eval_infinite(scene, new_d, False)
            * inf_weight[..., None],
            0.0,
        )

        return (radiance, new_throughput, next_found, new_o, new_d, new_hit)

    def cond(carry):
        depth, state = carry
        return (depth < bounce_limit) & jnp.any(state[2])

    def loop(carry):
        depth, state = carry
        return depth + 1, body(depth, state)

    state = (radiance, throughput, active, origin, direction, hit)
    _, state = jax.lax.while_loop(cond, loop, (jnp.asarray(0, jnp.int32), state))
    return state[0]


def naive_trace(
    scene: PreparedScene,
    stream: SampleStream,
    origin,
    direction,
    *,
    bounce_limit: int = 8,
):
    """Brute-force path tracer without NEE/MIS — the ground-truth evaluator
    used to validate importance sampling (StandardNaiveEvaluator.cs)."""
    n = origin.shape[0]
    radiance = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    o, d = origin, direction
    active = jnp.ones((n,), bool)
    ignore = jnp.full((n,), -1, jnp.int32)

    for depth in range(bounce_limit + 1):
        seg_t = jnp.where(active, INF, 0.0)
        hit = scene_ops.trace(scene, o, d, seg_t, ignore)
        found = active & hit.found
        escaped = active & ~hit.found
        radiance += jnp.where(
            escaped[..., None],
            throughput * scene_ops.eval_infinite(scene, d, depth == 0),
            0.0,
        )
        contact = scene_ops.interact(scene, hit, o, d)
        radiance += jnp.where(
            found[..., None], throughput * scene_ops.emission_at(scene, contact, -d), 0.0
        )
        if depth == bounce_limit:
            break
        tangent, bitangent = vec.orthonormal_frame(contact.shade_normal)
        wo_local = vec.to_local(-d, tangent, bitangent, contact.shade_normal)
        dim = BOUNCE_DIM_STRIDE * depth
        u2 = stream.white_2d(dim + DIM_BSDF)
        ul = stream.white_1d(dim + DIM_LOBE)
        bs = bsdf_mod.sample(contact.material, wo_local, u2, ul)
        cos_i = jnp.abs(bs.incident[..., 2])
        weight = bs.value * (cos_i / jnp.maximum(bs.pdf, 1e-20))[..., None]
        throughput = throughput * jnp.where(found[..., None] & (bs.pdf > 0.0)[..., None], weight, 1.0)
        active = found & (bs.pdf > 0.0)
        wi_world = vec.to_world(bs.incident, tangent, bitangent, contact.shade_normal)
        o = _offset_origin(contact.point, contact.geo_normal, wi_world)
        d = jnp.where(active[..., None], wi_world, d)
        ignore = jnp.maximum(hit.prim, 0)

    return radiance


def albedo(scene: PreparedScene, stream: SampleStream, origin, direction):
    """First-hit surface albedo AOV (AlbedoEvaluator.cs); misses evaluate
    the infinite lights."""
    n = origin.shape[0]
    hit = scene_ops.trace(scene, origin, direction, INF, jnp.full((n,), -1, jnp.int32))
    contact = scene_ops.interact(scene, hit, origin, direction)
    miss = scene_ops.eval_infinite(scene, direction, True)
    return jnp.where(hit.found[..., None], contact.material.albedo, miss)


def aggregator_quality(scene: PreparedScene, stream: SampleStream, origin, direction):
    """False-color traversal-cost AOV (reference AggregatorQualityEvaluator,
    Evaluation/Evaluators/AggregatorQualityEvaluator.cs): cheap rays map to
    blue, expensive ones through green to red."""
    from ..aggregation.bvh import trace_cost

    cost = trace_cost(scene.geometry, scene.bvh, origin, direction)
    # normalize on a soft log scale; ~32 visits is mid-range
    x = jnp.clip(jnp.log1p(cost) / jnp.log(256.0), 0.0, 1.0)
    r = jnp.clip(2.0 * x - 0.5, 0.0, 1.0)
    g = 1.0 - jnp.abs(2.0 * x - 1.0)
    b = jnp.clip(1.0 - 2.0 * x, 0.0, 1.0)
    return jnp.stack([r, g, b], axis=-1)


def normal_depth(scene: PreparedScene, stream: SampleStream, origin, direction):
    """Shading normal + depth AOV packed as (N, 4) (NormalDepthEvaluator.cs,
    Textures/Colors/NormalDepth128.cs)."""
    n = origin.shape[0]
    hit = scene_ops.trace(scene, origin, direction, INF, jnp.full((n,), -1, jnp.int32))
    contact = scene_ops.interact(scene, hit, origin, direction)
    normal = jnp.where(hit.found[..., None], contact.shade_normal, 0.0)
    depth = jnp.where(hit.found, hit.t, INF)
    return jnp.concatenate([normal, depth[..., None]], axis=-1)
