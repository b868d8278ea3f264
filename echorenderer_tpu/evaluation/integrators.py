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
from ..utils.diagnostics import dcheck
from ..utils.rng import SampleStream
from . import bsdf as bsdf_mod
from . import scene_ops

# Dimension layout of the deterministic sample streams. The camera owns
# dims [0, CAMERA_DIMS): 0 = subpixel jitter, 1 = lens sample. Bounce b
# draws from stratified dims CAMERA_DIMS + BOUNCE_DIM_STRIDE*b + offset,
# so no bounce draw can ever share a hash key with a camera draw. Both
# integrators (lockstep path_trace and the wavefront) use the SAME scheme
# through the shared path_step below — draw-level parity is a tested
# invariant (tests/test_integrators.py bitwise wavefront==lockstep).
CAMERA_DIMS = 2
DIM_BSDF = 0
DIM_LOBE = 1
DIM_LIGHT_PICK = 2
DIM_LIGHT_SAMPLE = 3
DIM_RR = 4
BOUNCE_DIM_STRIDE = 8


def _power_heuristic(pdf0, pdf1):
    """Veach power heuristic, exponent 2 (PathTracedEvaluator.cs:213)."""
    sq = pdf0 * pdf0
    return sq / jnp.maximum(sq + pdf1 * pdf1, 1e-20)


def _offset_origin(point, geo_normal, direction):
    """Offset a spawned ray origin along the geometric normal to avoid
    self-intersection (reference Contact.SpawnTrace offset)."""
    side = jnp.sign(vec.dot(geo_normal, direction))[..., None]
    return point + geo_normal * side * 1e-4


def path_step(
    scene: PreparedScene,
    stream: SampleStream,
    st: dict,
    live,
    *,
    bounce_limit: int,
    survivability: float,
    enable_nee: bool = True,
    enable_fwd_mis: bool = True,
    coherent: bool = False,
):
    """One shared path-tracing iteration — the hot loop of the reference
    (PathTracedEvaluator.cs:57-147) in wavefront form: trace the pending
    ray, add MIS-weighted emission / infinite-light radiance, run NEE with
    a shadow ray, sample the BSDF and apply Russian roulette.

    `st` carries the live path state per lane: radiance, throughput, o, d,
    depth, prev_pdf, prev_specular, prev_point, ignore. Both the lockstep
    integrator (path_trace) and the regenerating wavefront
    (evaluation/wavefront.py) call this exact function, so their per-sample
    draws AND arithmetic are bit-identical; only the scheduling differs.

    Returns a dict with the updated radiance, the post-bounce throughput
    (new_tp), the continuation mask/ray (continues, cont_o, wi_world),
    next-iteration MIS state (bs_pdf, bs_specular, contact_point,
    hit_prim), and an `aux` dict of event masks for statistics counters.
    """
    # --- trace the pending ray (advance) ---
    seg_t = jnp.where(live, INF, 0.0)
    hit = scene_ops.trace(
        scene, st["o"], st["d"], seg_t, st["ignore"], st.get("ignore_inst"),
        coherent=coherent,
    )
    hit_inst = hit.inst_or_zero
    found = live & hit.found
    contact = scene_ops.interact(scene, hit, st["o"], st["d"])

    # --- emission at the hit, MIS-weighted against NEE ---
    emitted = scene_ops.emission_at(scene, contact, -st["d"])
    if enable_fwd_mis and enable_nee:
        hit_light = scene_ops.hit_light_record(
            scene, jnp.maximum(hit.prim, 0), hit_inst
        )
        light_pm = scene_ops.light_pmf(scene, hit_light, st["prev_point"])
        fwd_pdf = light_pm * scene_ops.area_light_pdf(
            scene, hit.prim, st["prev_point"], contact.point,
            contact.geo_normal, st["d"], inst=hit_inst,
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
    dim = CAMERA_DIMS + BOUNCE_DIM_STRIDE * st["depth"]
    u_bsdf = stream.next_2d(dim + DIM_BSDF)
    u_lobe = stream.next_1d(dim + DIM_LOBE)
    u_pick = stream.next_1d(dim + DIM_LIGHT_PICK)
    u_light = stream.next_2d(dim + DIM_LIGHT_SAMPLE)
    u_rr = stream.next_1d(dim + DIM_RR)

    bs = bsdf_mod.sample(contact.material, wo_local, u_bsdf, u_lobe)
    cos_i = jnp.abs(bs.incident[..., 2])
    has_bounce = found & (bs.pdf > 0.0) & (st["depth"] < bounce_limit)

    # NEE (reference ImportanceSampleRadiant, PathTracedEvaluator.cs:162-207)
    candidate = jnp.zeros_like(found)
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
            scene, shadow_o, ls.incident, shadow_t, jnp.maximum(hit.prim, 0),
            ignore_inst=hit_inst, coherent=coherent,
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

    # device-side invariants (reference Ensure.cs class of checks); no-ops
    # unless ECHO_DEBUG_DEVICE=1 and the program runs via run_checked
    dcheck(jnp.isfinite(radiance), "path_step: non-finite radiance")
    dcheck(jnp.isfinite(new_tp) & (new_tp >= 0.0),
           "path_step: invalid throughput (NaN/Inf/negative)")
    dcheck(~has_bounce | (bs.pdf >= 0.0), "path_step: negative BSDF pdf")

    return dict(
        radiance=radiance,
        new_tp=new_tp,
        continues=continues,
        cont_o=cont_o,
        wi_world=wi_world,
        bs_pdf=bs.pdf,
        bs_specular=bs.specular,
        contact_point=contact.point,
        hit_prim=jnp.maximum(hit.prim, 0),
        hit_inst=hit_inst,
        aux=dict(
            found=found,
            candidate=candidate,
            has_bounce=has_bounce,
            survived=survived,
        ),
    )


def path_trace(
    scene: PreparedScene,
    stream: SampleStream,
    origin,
    direction,
    *,
    bounce_limit: int = 128,
    survivability: float = 2.5,
    first_wave_coherent: bool = False,
):
    """Estimate radiance along camera rays: the lockstep integrator — all
    lanes advance through the bounce loop together under masks. Draw- and
    arithmetic-identical to the wavefront (shared path_step); used as the
    A/B reference for the regeneration machinery.

    `first_wave_coherent`: the caller marks relative sample 0 — its camera
    bounce is peeled out of the while loop and traced with the coherent
    packet-walk dispatch. Must mirror the wavefront's iteration-0 peel
    exactly (same (sample==0, depth==0) population) so both integrators
    keep bitwise-equal per-sample sums."""
    n = origin.shape[0]
    st = dict(
        radiance=jnp.zeros((n, 3), jnp.float32),
        throughput=jnp.ones((n, 3), jnp.float32),
        o=origin,
        d=direction,
        depth=jnp.zeros((n,), jnp.int32),
        prev_pdf=jnp.zeros((n,), jnp.float32),
        prev_specular=jnp.ones((n,), bool),  # camera rays count as specular
        prev_point=origin,
        ignore=jnp.full((n,), -1, jnp.int32),
        ignore_inst=jnp.zeros((n,), jnp.int32),
    )
    live = jnp.ones((n,), bool)

    def cond(carry):
        return jnp.any(carry[0])

    def body(carry, coherent=False):
        live, st = carry
        out = path_step(
            scene, stream, st, live,
            bounce_limit=bounce_limit, survivability=survivability,
            coherent=coherent,
        )
        new_st = dict(
            radiance=out["radiance"],
            throughput=out["new_tp"],
            o=out["cont_o"],
            d=out["wi_world"],
            depth=st["depth"] + 1,
            prev_pdf=out["bs_pdf"],
            prev_specular=out["bs_specular"],
            prev_point=out["contact_point"],
            ignore=out["hit_prim"],
            ignore_inst=out["hit_inst"],
        )
        return live & out["continues"], new_st

    carry = (live, st)
    if first_wave_coherent:
        carry = body(carry, coherent=True)
    _, st = jax.lax.while_loop(cond, body, carry)
    return st["radiance"]


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
    ignore_inst = jnp.zeros((n,), jnp.int32)

    for depth in range(bounce_limit + 1):
        seg_t = jnp.where(active, INF, 0.0)
        hit = scene_ops.trace(scene, o, d, seg_t, ignore, ignore_inst)
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
        dim = CAMERA_DIMS + BOUNCE_DIM_STRIDE * depth
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
        ignore_inst = hit.inst_or_zero

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
