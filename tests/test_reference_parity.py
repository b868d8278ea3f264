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


def _oracle_render(prepared, res, spp, bounce_limit, seed):
    """Brute-force numpy path tracer over the prepared triangle soup:
    BSDF-sampling-only transport, float64, independent of all repo
    physics code. Returns (mean, sq_sum) per pixel, scan order."""
    g = prepared.geometry
    v0 = np.asarray(g.tri_v0, np.float64)
    e1 = np.asarray(g.tri_e1, np.float64)
    e2 = np.asarray(g.tri_e2, np.float64)
    tri_mat = np.asarray(g.tri_mat).astype(np.int64)
    mp = np.asarray(prepared.mat_pack, np.float64)
    albedo, mtype = mp[:, 0:3], mp[:, 10].astype(np.int64)
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
            # two-sided Lambert: throughput *= albedo, cosine sample on
            # the incoming side of the geometric normal
            tp = np.where(alive[:, None], tp * albedo[mat], tp)
            ns = np.where(facing[:, None], nrm, -nrm)
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
            d = (
                (r * np.cos(phi))[:, None] * tang
                + (r * np.sin(phi))[:, None] * bit
                + lz[:, None] * ns
            )
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
