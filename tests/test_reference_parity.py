"""Estimator parity against an INDEPENDENT transport oracle (VERDICT r2 #8).

The stated quality bar (BASELINE.md) is a pixel-distribution match to the
Echo CPU reference within Monte Carlo noise. The C# reference cannot
execute here (no dotnet runtime in the image), so this test supplies the
strongest available cross-check: a from-scratch numpy path tracer — its
own Moller-Trumbore intersection, its own cosine-hemisphere sampling, its
own RNG, ZERO code shared with echorenderer_tpu's physics — renders the
same prepared Cornell-box scene, and the production integrator's
per-region means must agree within combined Monte Carlo standard error.

Unlike tests/test_quality.py (naive-vs-path within this repo, which both
share scene_ops/bsdf code) this catches systematic transport drift: a
wrong cosine factor, a doubled emission term, a pdf bug common to both
in-repo integrators.

Transport semantics mirrored from the reference's spec (and this repo's
contract): emission is one-sided by the geometric normal
(reference Emissive.Emit; scene_ops.emission_at), Lambert reflection is
two-sided (flipped into the incoming hemisphere, bsdf._diffuse_sample),
misses are black in an ambient-free scene, paths run `bounce_limit`
bounces plus a final emission check (integrators.naive_trace loop shape).
"""

import jax.numpy as jnp
import numpy as np

from echorenderer_tpu.models import scenes
from echorenderer_tpu.processes.render import _sample_frame_jit
from echorenderer_tpu.scene.prepare import prepare_scene

RES = (16, 16)
SPP = 3072
BOUNCES = 8
REGION = 4  # compare means over REGION x REGION pixel blocks
BLOCK = 1 << 16  # oracle path block (bounds numpy peak memory)


def _np_fresnel_dielectric(cos_i, eta_i, eta_t):
    """Unpolarized dielectric Fresnel (the textbook equations the repo's
    spec also implements — formulas shared, code independent)."""
    cos_i = np.clip(np.abs(cos_i), 0.0, 1.0)
    sin2_t = (eta_i / eta_t) ** 2 * np.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin2_t >= 1.0
    cos_t = np.sqrt(np.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta_t * cos_i - eta_i * cos_t) / np.maximum(
        eta_t * cos_i + eta_i * cos_t, 1e-20)
    r_per = (eta_i * cos_i - eta_t * cos_t) / np.maximum(
        eta_i * cos_i + eta_t * cos_t, 1e-20)
    return np.where(tir, 1.0, 0.5 * (r_par ** 2 + r_per ** 2)), tir


def _np_fresnel_conductor(cos_i, eta, k):
    """Per-channel complex-IOR Fresnel (standard form)."""
    c = np.clip(np.abs(cos_i), 0.0, 1.0)[..., None]
    c2 = c * c
    s2 = 1.0 - c2
    e2 = eta * eta
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = np.sqrt(np.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = np.sqrt(np.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * c
    rs = (t1 - t2) / np.maximum(t1 + t2, 1e-20)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / np.maximum(t3 + t4, 1e-20)
    return 0.5 * (rs + rp)


def _np_artistic_to_physical(main, edge):
    """Gulbrandsen 2014 artist-friendly metallic Fresnel -> (eta, k)."""
    r = np.clip(main, 0.0, 1.0 - 1e-4)
    sqrt_r = np.sqrt(r)
    eta = (1.0 + sqrt_r) / (1.0 - sqrt_r) * (1.0 - edge) \
        + (1.0 - r) / (1.0 + r) * edge
    k2 = (r * (eta + 1.0) ** 2 - (eta - 1.0) ** 2) / np.maximum(1.0 - r, 1e-4)
    return np.maximum(eta, 1e-4), np.sqrt(np.maximum(k2, 0.0))


def _oracle_render(prepared, res, spp, bounce_limit, seed):
    """Brute-force numpy path tracer over the prepared triangle soup:
    BSDF-sampling-only transport, float64, independent of all repo
    physics code. Diffuse (Lambert), smooth dielectric (Fresnel
    reflect/refract lobe choice, radiance scaled by (eta_i/eta_t)^2 on
    transmission) and smooth artistic conductor (complex-Fresnel mirror)
    are supported. Returns (mean, sq_sum) per pixel, scan order."""
    g = prepared.geometry
    v0 = np.asarray(g.tri_v0, np.float64)
    e1 = np.asarray(g.tri_e1, np.float64)
    e2 = np.asarray(g.tri_e2, np.float64)
    tri_mat = np.asarray(g.tri_mat).astype(np.int64)
    mp = np.asarray(prepared.mat_pack, np.float64)
    albedo, mtype = mp[:, 0:3], mp[:, 10].astype(np.int64)
    m_ior = mp[:, 4]
    m_edge = mp[:, 7:10]
    is_emissive = mtype == 4  # scene/materials.py EMISSIVE
    geo_n = np.cross(e1, e2)
    geo_n /= np.linalg.norm(geo_n, axis=1, keepdims=True)
    tri_ids = np.arange(len(v0))[None]

    cam = prepared.camera
    pos = np.asarray(cam.position, np.float64)
    rot = np.asarray(cam.rotation, np.float64)
    fl = float(cam.forward_length)
    width, height = res
    n_px = width * height
    rng = np.random.default_rng(seed)

    def trace_block(o, d):
        n = o.shape[0]
        tp = np.ones((n, 3))
        rad = np.zeros((n, 3))
        ignore = np.full(n, -1, np.int64)
        alive = np.ones(n, bool)
        for depth in range(bounce_limit + 1):
            # two-sided Moller-Trumbore against every triangle
            pvec = np.cross(d[:, None, :], e2[None])  # (N, T, 3)
            det = np.einsum("tk,ntk->nt", e1, pvec)
            inv = np.where(np.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = o[:, None, :] - v0[None]
            u = np.einsum("ntk,ntk->nt", tvec, pvec) * inv
            qvec = np.cross(tvec, e1[None])
            v = np.einsum("nk,ntk->nt", d, qvec) * inv
            t = np.einsum("tk,ntk->nt", e2, qvec) * inv
            ok = (
                (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
                & (t > 1e-5) & alive[:, None] & (tri_ids != ignore[:, None])
            )
            t = np.where(ok, t, np.inf)
            prim = np.argmin(t, axis=1)
            t_hit = t[np.arange(n), prim]
            found = np.isfinite(t_hit)
            prim = np.where(found, prim, 0)

            nrm = geo_n[prim]
            facing = np.einsum("nk,nk->n", nrm, -d) > 0
            mat = tri_mat[prim]
            emis = found & is_emissive[mat]
            rad += np.where((emis & facing)[:, None], tp * albedo[mat], 0.0)
            alive = alive & found & ~emis
            if depth == bounce_limit or not alive.any():
                break

            hit_p = o + np.where(found, t_hit, 0.0)[:, None] * d
            ns = np.where(facing[:, None], nrm, -nrm)  # incident-side normal
            m_t = mtype[mat]
            cos_i = np.abs(np.einsum("nk,nk->n", ns, -d))

            # --- Lambert (two-sided): tp *= albedo, cosine sample ---
            up = np.where(
                np.abs(ns[:, 2:3]) < 0.9,
                np.array([[0.0, 0.0, 1.0]]),
                np.array([[1.0, 0.0, 0.0]]),
            )
            tang = np.cross(up, ns)
            tang /= np.maximum(
                np.linalg.norm(tang, axis=1, keepdims=True), 1e-12
            )
            bit = np.cross(ns, tang)
            u2 = rng.random((n, 2))
            r = np.sqrt(u2[:, 0])
            phi = 2 * np.pi * u2[:, 1]
            lz = np.sqrt(np.maximum(1.0 - u2[:, 0], 0.0))
            d_diff = (
                (r * np.cos(phi))[:, None] * tang
                + (r * np.sin(phi))[:, None] * bit
                + lz[:, None] * ns
            )

            # --- smooth dielectric: lobe by exact Fresnel; transmission
            # scales radiance by (eta_i/eta_t)^2 (repo Specular.cs spec) ---
            ior = np.maximum(m_ior[mat], 1.0 + 1e-4)
            eta_i = np.where(facing, 1.0, ior)
            eta_t = np.where(facing, ior, 1.0)
            f_d, tir = _np_fresnel_dielectric(cos_i, eta_i, eta_t)
            u_lobe = rng.random(n)
            refl = (u_lobe < f_d) | tir
            d_refl = d + 2.0 * cos_i[:, None] * ns
            eta = eta_i / eta_t
            cos_t = np.sqrt(
                np.maximum(1.0 - eta * eta * (1.0 - cos_i * cos_i), 0.0))
            d_refr = eta[:, None] * d + (eta * cos_i - cos_t)[:, None] * ns
            d_refr /= np.maximum(
                np.linalg.norm(d_refr, axis=1, keepdims=True), 1e-12)
            d_diel = np.where(refl[:, None], d_refl, d_refr)
            tp_diel = albedo[mat] * np.where(refl, 1.0, eta * eta)[:, None]

            # --- smooth artistic conductor: complex-Fresnel mirror ---
            eta_c, k_c = _np_artistic_to_physical(albedo[mat], m_edge[mat])
            tp_cond = _np_fresnel_conductor(cos_i, eta_c, k_c)

            diel = m_t == 2
            cond = m_t == 3
            d = np.where(diel[:, None], d_diel,
                         np.where(cond[:, None], d_refl, d_diff))
            mult = np.where(diel[:, None], tp_diel,
                            np.where(cond[:, None], tp_cond, albedo[mat]))
            tp = np.where(alive[:, None], tp * mult, tp)
            o = hit_p
            ignore = np.where(alive, prim, -1)
        return rad

    mean = np.zeros((n_px, 3))
    sq = np.zeros((n_px, 3))
    px = np.arange(n_px) % width
    py = np.arange(n_px) // width
    done = 0
    per_wave = max(1, BLOCK // n_px)
    while done < spp:
        cnt = min(per_wave, spp - done)
        shift = rng.random((cnt * n_px, 2))
        x = (np.tile(px, cnt) + shift[:, 0]) / width - 0.5
        y = (np.tile(py, cnt) + shift[:, 1]) / width - height / (2.0 * width)
        d = np.stack([x, y, np.full(cnt * n_px, fl)], -1) @ rot.T
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(pos, (cnt * n_px, 3)).copy()
        rad = trace_block(o, d).reshape(cnt, n_px, 3)
        mean += rad.sum(axis=0)
        sq += (rad * rad).sum(axis=0)
        done += cnt
    return mean / spp, sq


def _region_means(img, res):
    w, h = res
    r = img.reshape(h // REGION, REGION, w // REGION, REGION, 3)
    return r.mean(axis=(1, 3))


def _region_se(mean, sq, spp, res):
    """Standard error of each REGION-block mean from per-pixel (mean, sq)."""
    var = np.maximum(sq / spp - mean * mean, 0.0) / spp  # var of pixel mean
    w, h = res
    v = var.reshape(h // REGION, REGION, w // REGION, REGION, 3)
    return np.sqrt(v.mean(axis=(1, 3)) / (REGION * REGION))


def test_cornell_matches_independent_oracle():
    prepared = prepare_scene(scenes.cornell_box())
    o_mean, o_sq = _oracle_render(prepared, RES, SPP, BOUNCES, seed=7)

    s_sum, s_sq = _sample_frame_jit(
        prepared, "path", RES, 0, jnp.asarray(0, jnp.uint32), SPP,
        BOUNCES, 2.5,
    )
    r_mean = np.asarray(s_sum, np.float64) / SPP
    r_sq = np.asarray(s_sq, np.float64)

    ro = _region_means(o_mean, RES)
    rr = _region_means(r_mean, RES)
    se = np.sqrt(
        _region_se(o_mean, o_sq, SPP, RES) ** 2
        + _region_se(r_mean, r_sq, SPP, RES) ** 2
    )
    # 16 regions x 3 channels at 5 sigma + a small absolute floor for
    # f32-vs-f64 accumulation differences
    diff = np.abs(ro - rr)
    tol = 5.0 * se + 5e-3
    assert (diff <= tol).all(), (
        f"region means drift from independent oracle:\n"
        f"max diff {diff.max():.5f} vs tol {tol[np.unravel_index(diff.argmax(), diff.shape)]:.5f}\n"
        f"oracle {ro[..., 0]}\nrender {rr[..., 0]}"
    )
    # whole-image luminance within 1.5%
    lo, lr = float(o_mean.mean()), float(r_mean.mean())
    assert abs(lo - lr) / max(lo, 1e-9) < 0.015, (lo, lr)


def _img_se(mean, sq, spp):
    """Standard error of the whole-image mean from per-pixel (mean, sq)."""
    var = np.maximum(sq / spp - mean * mean, 0.0) / spp
    return float(np.sqrt(var.sum()) / var.size)


def _compare(prepared, spp, bounces, seed, sigma=5.0):
    o_mean, o_sq = _oracle_render(prepared, RES, spp, bounces, seed=seed)
    s_sum, s_sq = _sample_frame_jit(
        prepared, "path", RES, 0, jnp.asarray(0, jnp.uint32), spp,
        bounces, 2.5,
    )
    r_mean = np.asarray(s_sum, np.float64) / spp
    r_sq = np.asarray(s_sq, np.float64)
    ro = _region_means(o_mean, RES)
    rr = _region_means(r_mean, RES)
    se = np.sqrt(
        _region_se(o_mean, o_sq, spp, RES) ** 2
        + _region_se(r_mean, r_sq, spp, RES) ** 2
    )
    diff = np.abs(ro - rr)
    tol = sigma * se + 5e-3
    assert (diff <= tol).all(), (
        f"region means drift from independent oracle:\n"
        f"max diff {diff.max():.5f} vs tol "
        f"{tol[np.unravel_index(diff.argmax(), diff.shape)]:.5f}\n"
        f"oracle {ro[..., 0]}\nrender {rr[..., 0]}"
    )
    # whole-image luminance: noise-aware tolerance (the BSDF-only oracle's
    # image mean is itself high-variance on small-light scenes) + a small
    # floor for f32-vs-f64 accumulation
    lo, lr = float(o_mean.mean()), float(r_mean.mean())
    se_img = np.sqrt(_img_se(o_mean, o_sq, spp) ** 2
                     + _img_se(r_mean, r_sq, spp) ** 2)
    assert abs(lo - lr) <= sigma * se_img + 0.005 * max(lo, lr), (
        lo, lr, se_img)


def test_small_light_nee_mis_matches_oracle():
    """NEE + power-heuristic MIS against the BSDF-only oracle on a scene
    where MIS weights carry the image: ONE small bright area light (1/16
    the cornell light's area, 16x its radiance). A wrong MIS weight or a
    doubled NEE term shifts region means far outside the tolerance; the
    oracle never evaluates NEE so the two estimators share nothing but
    the integral they estimate. Ref: PathTracedEvaluator.cs:162-213."""
    from echorenderer_tpu.models.scenes import cornell_box
    from echorenderer_tpu.scene import Emissive, PlaneEntity

    scene = cornell_box()
    # shrink the stock light away and add a small, bright one
    for ent in scene.children:
        mat = getattr(ent, "material", None)
        if mat is not None and type(mat).__name__ == "Emissive":
            ent.size = ent.size * 0.25  # 1/16 area
            ent.material = Emissive(
                albedo=tuple(np.asarray([18.4, 15.6, 8.0]) * 16.0))
    prepared = prepare_scene(scene)
    _compare(prepared, spp=4096, bounces=6, seed=11)


def test_specular_transport_matches_oracle():
    """Smooth dielectric (Fresnel lobe choice + radiance (eta_i/eta_t)^2)
    and smooth artistic conductor (complex Fresnel) against independent
    numpy implementations of the same published formulas. A Fresnel sign
    flip, a missing eta^2, or a wrong lobe pdf biases region means well
    past tolerance. Ref: Specular.cs:62, Conductor.cs:100-118."""
    from echorenderer_tpu.models.scenes import cornell_box
    from echorenderer_tpu.scene import BoxEntity, Conductor, Dielectric

    scene = cornell_box()
    scene.add(BoxEntity(  # glass slab mid-room
        size=(4.0, 5.0, 0.6),
        material=Dielectric(albedo=(0.95, 0.97, 1.0), roughness=0.0,
                            refractive_index=1.5),
        position=(0.0, 4.0, -2.5),
    ))
    scene.add(BoxEntity(  # mirror panel near the left wall
        size=(0.4, 7.0, 7.0),
        material=Conductor(albedo=(0.9, 0.7, 0.4), edge=(1.0, 1.0, 1.0),
                           roughness=0.0, artistic=True),
        position=(-4.5, 3.5, 1.0), rotation=(0, 15, 0),
    ))
    prepared = prepare_scene(scene)
    _compare(prepared, spp=3072, bounces=8, seed=13)
