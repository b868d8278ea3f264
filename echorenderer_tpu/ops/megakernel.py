"""Fused wavefront megakernel: the ENTIRE path-tracing iteration — camera
spawn, trace, shading, NEE + shadow ray, Russian roulette, path
regeneration and Welford accumulation — in ONE Pallas TPU kernel.

Why: profiling round 1 (CLAUDE.md) showed intersection kernels at ~18% of
frame time with the remaining ~82% spread over ~40 XLA shading fusions
running at 100-250 GiB/s — every fusion boundary round-trips the full
wavefront state through HBM. Here the whole per-block path state lives in
VMEM/registers across the regeneration loop; HBM traffic drops to the
initial pixel coordinates and the final per-pixel (sum, sum²) — the
reference's megakernel-per-thread design (PathTracedEvaluator.cs:57-147)
realized as one kernel per 1024-lane ray block.

Draw/physics parity: this kernel REPLICATES evaluation/integrators.path_step
and evaluation/wavefront.sample_frame_wavefront op-for-op in component
(structure-of-rows) form — same deterministic sample streams (utils/rng.py
functions are called directly; they are Mosaic-safe), same formulas in the
same order. tests/test_megakernel.py pins per-sample agreement against the
XLA wavefront; any physics change MUST be made in both places (see the
'never fork the physics' invariant in CLAUDE.md — this kernel is the one
sanctioned, test-pinned exception).

Supported scene envelope (everything else falls back to the XLA wavefront):
  - prims fit the dense-chunk layout (padded <= MEGA_PRIM_LIMIT)
  - flat power-CDF light selection OR the Estevez-Kulla light tree
    (in-kernel probabilistic descent + forward-MIS replay over one-hot
    node fetches; tree depth <= 24 so the path bitmask is f32-exact)
  - constant ambient (no env-map importance sampling)
  - texture atlases up to MEGA_TEX_LIMIT textures (albedo + normal maps +
    roughness textures, in-kernel one-hot bilinear over the shared
    bf16-quantized atlas — texel-exact vs the XLA wavefront)
  - perspective camera (incl. thin-lens DoF)
  - all material models (diffuse/dielectric/conductor/emissive/coated/
    invisible, incl. OneSided backface pass-through)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.rng import SampleStream
from .pallas_hier import HCHUNK
from .pallas_intersect import PRIM_BLOCK, RAY_BLOCK, _chunk_hits, _interpret

# applicability limits: prim rows + (chunk, BR) intermediates must fit VMEM
MEGA_PRIM_LIMIT = 2048
MEGA_LIGHT_LIMIT = 512
# textures the in-kernel bilinear fetch tolerates: every sample reads the
# whole (3R, A*R) texel table through a 0/1 one-hot matmul, so cost grows
# linearly with A (r4: ~0.4 Gflop/block-iteration per 256^2 texture)
MEGA_TEX_LIMIT = 4

# "fat chunk" layout for the hierarchical megakernel (large scenes): the
# 16 intersect rows of ops/pallas_hier's chunk tensor followed by the 17
# SP_ROWS shading rows, padded to 40 sublanes. Streaming the shading
# attributes WITH the geometry and capturing the winning prim's rows in
# the hit merge is what removes every per-prim table lookup from the
# shading stage — the O(P) one-hot gathers that cap the dense megakernel
# at MEGA_PRIM_LIMIT don't exist on this path.
FAT_ROWS = 40
FAT_ATTR = 16  # first shading row inside a fat chunk
# walk state rows in VMEM scratch: 0 t (or occlusion flag), 1 p, 2 u, 3 v,
# 4..20 captured shading rows
WS_ROWS = 24

_INF = 3.4e38
F32 = jnp.float32
U32 = jnp.uint32

# material type ids (scene/materials.py) — inlined to keep the kernel free
# of module imports at trace time
INVISIBLE, DIFFUSE, DIELECTRIC, CONDUCTOR, EMISSIVE, COATED_DIFFUSE = 0, 1, 2, 3, 4, 5
# light kinds (scene/prepare.py)
LIGHT_POINT, LIGHT_DIRECTIONAL, LIGHT_AMBIENT, LIGHT_EMISSIVE = 0, 1, 2, 3
# stream dims (evaluation/integrators.py) — kept numerically in sync by
# tests/test_megakernel.py
CAMERA_DIMS = 2
DIM_BSDF, DIM_LOBE, DIM_LIGHT_PICK, DIM_LIGHT_SAMPLE, DIM_RR = 0, 1, 2, 3, 4
BOUNCE_DIM_STRIDE = 8

INV_PI = 1.0 / np.pi
INV_TAU = 0.5 / np.pi
ALPHA_THRESHOLD = 1e-4
_LUM_R, _LUM_G, _LUM_B = 0.212671, 0.715160, 0.072169

# packed shade-row table layout (built by _build_tables, sorted prim order):
#   0:3 geo normal / sphere center, 3:6 n0 (3 = radius), 6:9 n1, 9:12 n2,
#   12 material id, 13 area, 14 is_sphere, 15 light record (-1), 16 light power
SP_ROWS = 17
# packed material-row table layout: 0:3 albedo, 3:7 params, 7:10 extra,
#   10 type, 11 one_sided
MT_ROWS = 12
# packed light-record table: 0 kind, 1 cdf, 2 power, 3:6 pos/dir,
#   6:9 intensity, 9 emissive index, 10 w_inf (infinite-light power or 0),
#   11 cdf over w_inf (pad 2.0), 12 record -> tree light id (-1)
LT_ROWS = 13
# packed emissive rows: 0:3 v0/center, 3:6 e1 (3 = radius), 6:9 e2,
#   9:12 normal, 12:15 emitted, 15 area, 16 is_sphere, 17 sorted prim id
EP_ROWS = 18

# camera/scalar SMEM row layout
C_POS, C_ROT, C_FL, C_LENS, C_FOCAL = 0, 3, 12, 13, 14
C_AMB_ALL, C_AMB_CAM, C_AMB_PMF, C_TOTAL_POWER = 16, 19, 22, 23
C_P_INF, C_SUM_INF = 24, 25  # light-tree infinite/finite split scalars
C_LEN = 26


# ---------------------------------------------------------------------------
# component-vector helpers: a 3-vector is a tuple of 3 same-shape f32 arrays
# ---------------------------------------------------------------------------


def _vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _vneg(a):
    return (-a[0], -a[1], -a[2])


def _vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _vmul(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _vwhere(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]), jnp.where(m, a[2], b[2]))


def _vzero(like):
    z = jnp.zeros_like(like)
    return (z, z, z)


def _vnormalize(a):
    """Mirror of utils/vec.normalize: zero vectors map to zero."""
    sq = _vdot(a, a)
    inv = jnp.where(sq > 0.0, jax.lax.rsqrt(jnp.maximum(sq, 1e-38)), 0.0)
    return _vscale(a, inv)


def _frame(n):
    """Duff et al. orthonormal basis (mirror of utils/vec.orthonormal_frame)."""
    sign = jnp.where(n[2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[2])
    b = n[0] * n[1] * a
    tangent = (1.0 + sign * n[0] * n[0] * a, sign * b, -sign * n[0])
    bitangent = (b, sign + n[1] * n[1] * a, -n[1])
    return tangent, bitangent


def _to_local(v, t, b, n):
    return (_vdot(v, t), _vdot(v, b), _vdot(v, n))


def _to_world(v, t, b, n):
    return (
        v[0] * t[0] + v[1] * b[0] + v[2] * n[0],
        v[0] * t[1] + v[1] * b[1] + v[2] * n[1],
        v[0] * t[2] + v[1] * b[2] + v[2] * n[2],
    )


def _luminance(rgb):
    return rgb[0] * _LUM_R + rgb[1] * _LUM_G + rgb[2] * _LUM_B


def _power_heuristic(pdf0, pdf1):
    sq = pdf0 * pdf0
    return sq / jnp.maximum(sq + pdf1 * pdf1, 1e-20)


def _offset_origin(point, geo_n, direction):
    side = jnp.sign(_vdot(geo_n, direction))
    return _vadd(point, _vscale(geo_n, side * 1e-4))


# --- sample mappings (mirrors of utils/rng.py) ---


def _uniform_sphere(ux, uy):
    z = 1.0 - 2.0 * ux
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * np.pi * uy
    return (r * jnp.cos(phi), r * jnp.sin(phi), z)


def _concentric_disk(ux, uy):
    ox = 2.0 * ux - 1.0
    oy = 2.0 * uy - 1.0
    r_big = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(r_big, ox, oy)
    ratio = jnp.where(
        r_big,
        jnp.where(ox != 0.0, oy / jnp.where(ox == 0.0, 1.0, ox), 0.0),
        jnp.where(oy != 0.0, ox / jnp.where(oy == 0.0, 1.0, oy), 0.0),
    )
    theta = jnp.where(
        r_big, (np.pi / 4.0) * ratio, (np.pi / 2.0) - (np.pi / 4.0) * ratio
    )
    zero = (ox == 0.0) & (oy == 0.0)
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return x, y


def _cosine_hemisphere(ux, uy):
    dx, dy = _concentric_disk(ux, uy)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx**2 - dy**2))
    return (dx, dy, z)


def _uniform_triangle(ux, uy):
    s = jnp.sqrt(jnp.maximum(ux, 0.0))
    return 1.0 - s, uy * s


# ---------------------------------------------------------------------------
# BSDF models in component form (mirrors of evaluation/bsdf.py — keep in
# op-for-op sync; the parity test compares per-sample radiance)
# ---------------------------------------------------------------------------


def _negz(w):
    return (w[0], w[1], -w[2])


def _roughness_to_alpha(r):
    r = jnp.clip(r * 0.75, 0.0, 1.0)
    return jnp.maximum(r * r, ALPHA_THRESHOLD)


def _fresnel_dielectric(cos_i, eta_i, eta_t):
    ci = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)
    sin2_t = (eta_i / eta_t) ** 2 * jnp.maximum(1.0 - ci * ci, 0.0)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta_t * ci - eta_i * cos_t) / jnp.maximum(eta_t * ci + eta_i * cos_t, 1e-20)
    r_per = (eta_i * ci - eta_t * cos_t) / jnp.maximum(eta_i * ci + eta_t * cos_t, 1e-20)
    f = 0.5 * (r_par * r_par + r_per * r_per)
    return jnp.where(tir, 1.0, f), cos_t, tir


def _fresnel_conductor(cos_i, eta, k):
    c = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)
    c2 = c * c
    s2 = 1.0 - c2

    def chan(e, kk):
        e2 = e * e
        k2 = kk * kk
        t0 = e2 - k2 - s2
        a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
        t1 = a2b2 + c2
        a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
        t2 = 2.0 * a * c
        rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
        t3 = c2 * a2b2 + s2 * s2
        t4 = t2 * s2
        rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
        return 0.5 * (rs + rp)

    return (chan(eta[0], k[0]), chan(eta[1], k[1]), chan(eta[2], k[2]))


def _artistic_to_physical(main, edge):
    def chan(r, g):
        r = jnp.clip(r, 0.0, 1.0 - 1e-4)
        sqrt_r = jnp.sqrt(r)
        eta = (1.0 + sqrt_r) / (1.0 - sqrt_r) * (1.0 - g) + (1.0 - r) / (1.0 + r) * g
        k2 = (r * (eta + 1.0) ** 2 - (eta - 1.0) ** 2) / jnp.maximum(1.0 - r, 1e-4)
        return jnp.maximum(eta, 1e-4), jnp.sqrt(jnp.maximum(k2, 0.0))

    e0, k0 = chan(main[0], edge[0])
    e1, k1 = chan(main[1], edge[1])
    e2, k2 = chan(main[2], edge[2])
    return (e0, e1, e2), (k0, k1, k2)


def _ggx_d(m, alpha):
    c2 = m[2] ** 2
    t = c2 * (alpha * alpha - 1.0) + 1.0
    return alpha * alpha / jnp.maximum(np.pi * t * t, 1e-20)


def _ggx_lambda(w, alpha):
    c2 = w[2] ** 2
    s2 = jnp.maximum(1.0 - c2, 0.0)
    tan2 = s2 / jnp.maximum(c2, 1e-12)
    return 0.5 * (jnp.sqrt(1.0 + alpha * alpha * tan2) - 1.0)


def _ggx_g1(w, alpha):
    return 1.0 / (1.0 + _ggx_lambda(w, alpha))


def _ggx_g2(wo, wi, alpha):
    return 1.0 / (1.0 + _ggx_lambda(wo, alpha) + _ggx_lambda(wi, alpha))


def _ggx_sample_vndf(wo, alpha, ux, uy):
    sign = jnp.sign(jnp.where(wo[2] == 0.0, 1.0, wo[2]))
    v = _vscale(wo, sign)
    vh = (alpha * v[0], alpha * v[1], v[2])
    vh = _vscale(vh, 1.0 / jnp.maximum(jnp.sqrt(_vdot(vh, vh)), 1e-20))
    lensq = vh[0] ** 2 + vh[1] ** 2
    inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
    big = lensq > 1e-12
    t1 = (
        jnp.where(big, -vh[1] * inv_len, 1.0),
        jnp.where(big, vh[0] * inv_len, 0.0),
        jnp.where(big, jnp.zeros_like(inv_len), 0.0),
    )
    t2 = _vcross(vh, t1)
    r = jnp.sqrt(ux)
    phi = 2.0 * np.pi * uy
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = _vadd(_vadd(_vscale(t1, p1), _vscale(t2, p2)), _vscale(vh, p3))
    m = (alpha * nh[0], alpha * nh[1], jnp.maximum(nh[2], 1e-6))
    return _vscale(m, 1.0 / jnp.maximum(jnp.sqrt(_vdot(m, m)), 1e-20))


def _ggx_pdf_reflect(wo, m, alpha):
    return _ggx_g1(wo, alpha) * _ggx_d(m, alpha) / jnp.maximum(4.0 * jnp.abs(wo[2]), 1e-8)


def _same_hemi(a, b):
    return a[2] * b[2] > 0.0


def _oren_nayar_value(wo, wi, roughness):
    a = 1.0 / ((np.pi / 2.0 - 2.0 / 3.0) * roughness + np.pi)
    b = a * roughness
    cos_o = jnp.abs(wo[2])
    cos_i = jnp.abs(wi[2])
    s = _vdot(wo, wi) - cos_o * cos_i
    s = jnp.where(s > 0.0, s / jnp.maximum(jnp.maximum(cos_o, cos_i), 1e-8), s)
    return a + b * s


def _diffuse_eval(albedo, params, wo, wi):
    roughness = params[0]
    transmissive = params[1] > 0.5
    same = _same_hemi(wo, wi)
    lambert = jnp.where(roughness < 1e-6, INV_PI, _oren_nayar_value(wo, wi, roughness))
    refl = jnp.where(same, lambert, 0.0)
    value = jnp.where(transmissive, INV_TAU, refl)
    return _vscale(albedo, value)


def _diffuse_pdf(params, wo, wi):
    transmissive = params[1] > 0.5
    same = _same_hemi(wo, wi)
    refl = jnp.where(same, jnp.abs(wi[2]) * INV_PI, 0.0)
    trans = jnp.abs(wi[2]) * INV_TAU
    return jnp.where(transmissive, trans, refl)


def _diffuse_sample(albedo, params, wo, ux, uy, u_lobe):
    transmissive = params[1] > 0.5
    wi = _cosine_hemisphere(ux, uy)
    refl_wi = _vwhere(wo[2] < 0.0, _negz(wi), wi)
    trans_flip = (u_lobe > 0.5) ^ (wo[2] > 0.0)
    trans_wi = _vwhere(trans_flip, _negz(wi), wi)
    wi = _vwhere(transmissive, trans_wi, refl_wi)
    zero = jnp.zeros_like(u_lobe)
    return wi, _diffuse_eval(albedo, params, wo, wi), _diffuse_pdf(params, wo, wi), zero


def _dielectric_setup(params, wo):
    ior = jnp.maximum(params[1], 1.0 + 1e-4)
    entering = wo[2] > 0.0
    eta_i = jnp.where(entering, 1.0, ior)
    eta_t = jnp.where(entering, ior, 1.0)
    return ior, eta_i, eta_t


def _refract(wo, m, eta_i, eta_t):
    cos_i = _vdot(wo, m)
    eta = eta_i / eta_t
    sin2_t = eta * eta * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi = _vadd(_vscale(wo, -eta), _vscale(m, eta * cos_i - cos_t))
    norm = jnp.sqrt(jnp.maximum(_vdot(wi, wi), 1e-20))
    return _vscale(wi, 1.0 / norm), ok


def _dielectric_smooth_sample(albedo, params, wo, u_lobe):
    ior, eta_i, eta_t = _dielectric_setup(params, wo)
    f, cos_t, tir = _fresnel_dielectric(wo[2], eta_i, eta_t)
    reflect = (u_lobe < f) | tir
    wi_r = (-wo[0], -wo[1], wo[2])
    nz = jnp.where(wo[2] > 0.0, 1.0, -1.0)
    n = (jnp.zeros_like(nz), jnp.zeros_like(nz), nz)
    wi_t, _ = _refract(wo, n, eta_i, eta_t)
    wi = _vwhere(reflect, wi_r, wi_t)
    scale = jnp.where(reflect, f, (1.0 - f) * (eta_i / eta_t) ** 2)
    pdf = jnp.where(reflect, f, 1.0 - f)
    pdf = jnp.where(tir, 1.0, pdf)
    scale = jnp.where(tir, 1.0, scale)
    value = _vscale(albedo, scale / jnp.maximum(jnp.abs(wi[2]), 1e-8))
    one = jnp.ones_like(pdf)
    return wi, value, pdf, one


def _dielectric_rough_eval_pdf(albedo, params, wo, wi):
    alpha = _roughness_to_alpha(params[0])
    ior, eta_i, eta_t = _dielectric_setup(params, wo)
    same = _same_hemi(wo, wi)

    m_r = _vadd(wo, wi)
    m_len = jnp.sqrt(jnp.maximum(_vdot(m_r, m_r), 1e-20))
    m_r = _vscale(m_r, 1.0 / m_len)
    m_r = _vscale(m_r, jnp.sign(m_r[2]))
    f_r, _, _ = _fresnel_dielectric(_vdot(wo, m_r), eta_i, eta_t)
    d_r = _ggx_d(m_r, alpha)
    g_r = _ggx_g2(wo, wi, alpha)
    denom = jnp.maximum(4.0 * jnp.abs(wo[2]) * jnp.abs(wi[2]), 1e-8)
    refl_val = jnp.where(same, d_r * g_r * f_r / denom, 0.0)
    pdf_r = jnp.where(same, _ggx_pdf_reflect(wo, m_r, alpha), 0.0)

    eta = eta_t / eta_i
    m_t = _vadd(wo, _vscale(wi, eta))
    m_t = _vscale(m_t, 1.0 / jnp.maximum(jnp.sqrt(_vdot(m_t, m_t)), 1e-20))
    m_t = _vscale(m_t, jnp.sign(m_t[2]))
    wo_m = _vdot(wo, m_t)
    wi_m = _vdot(wi, m_t)
    valid_t = (~same) & (wo_m * wi_m < 0.0)
    f_t, _, _ = _fresnel_dielectric(wo_m, eta_i, eta_t)
    d_t = _ggx_d(m_t, alpha)
    g_t = _ggx_g2(wo, wi, alpha)
    sqrt_denom = wo_m + eta * wi_m
    denom_t = jnp.maximum(sqrt_denom * sqrt_denom, 1e-10)
    dwh_dwi = eta * eta * jnp.abs(wi_m) / denom_t
    trans_val = jnp.where(
        valid_t,
        (1.0 - f_t) * d_t * g_t * jnp.abs(wo_m) * jnp.abs(wi_m)
        / jnp.maximum(jnp.abs(wo[2]) * jnp.abs(wi[2]) * denom_t, 1e-10),
        0.0,
    )
    pdf_m_t = _ggx_g1(wo, alpha) * d_t * jnp.abs(wo_m) / jnp.maximum(jnp.abs(wo[2]), 1e-8)
    pdf_t = jnp.where(valid_t, pdf_m_t * dwh_dwi, 0.0)

    value = _vscale(albedo, refl_val + trans_val)
    pdf = pdf_r * f_r + pdf_t * (1.0 - f_t)
    return value, pdf


def _dielectric_rough_sample(albedo, params, wo, ux, uy, u_lobe):
    alpha = _roughness_to_alpha(params[0])
    ior, eta_i, eta_t = _dielectric_setup(params, wo)
    m = _ggx_sample_vndf(wo, alpha, ux, uy)
    m_signed = _vscale(m, jnp.sign(wo[2]))
    wi_r = _vsub(_vscale(m_signed, 2.0 * _vdot(wo, m_signed)), wo)
    wi_t, ok_t = _refract(wo, m_signed, eta_i, eta_t)
    f, _, _ = _fresnel_dielectric(_vdot(wo, m_signed), eta_i, eta_t)
    pick_reflect = (u_lobe < f) | ~ok_t
    wi = _vwhere(pick_reflect, wi_r, wi_t)
    value, pdf = _dielectric_rough_eval_pdf(albedo, params, wo, wi)
    zero = jnp.zeros_like(pdf)
    return wi, value, pdf, zero


def _conductor_fresnel(albedo, params, extra, wo_m):
    artistic = params[1] > 0.5
    eta_a, k_a = _artistic_to_physical(albedo, extra)
    eta = _vwhere(
        artistic, eta_a,
        (jnp.maximum(albedo[0], 1e-4), jnp.maximum(albedo[1], 1e-4), jnp.maximum(albedo[2], 1e-4)),
    )
    k = _vwhere(artistic, k_a, extra)
    return _fresnel_conductor(wo_m, eta, k)


def _conductor_eval_pdf(albedo, params, extra, wo, wi):
    alpha = _roughness_to_alpha(params[0])
    same = _same_hemi(wo, wi)
    m = _vadd(wo, wi)
    m = _vscale(m, 1.0 / jnp.maximum(jnp.sqrt(_vdot(m, m)), 1e-20))
    m = _vscale(m, jnp.sign(m[2]))
    f = _conductor_fresnel(albedo, params, extra, _vdot(wo, m))
    d = _ggx_d(m, alpha)
    g = _ggx_g2(wo, wi, alpha)
    denom = jnp.maximum(4.0 * jnp.abs(wo[2]) * jnp.abs(wi[2]), 1e-8)
    dg = d * g / denom
    value = _vwhere(same, _vscale(f, dg), _vzero(dg))
    pdf = jnp.where(same, _ggx_pdf_reflect(wo, m, alpha), 0.0)
    return value, pdf


def _conductor_sample(albedo, params, extra, wo, ux, uy):
    roughness = params[0]
    alpha = _roughness_to_alpha(roughness)
    is_specular = jnp.clip(roughness * 0.75, 0.0, 1.0) ** 2 < ALPHA_THRESHOLD

    m = _ggx_sample_vndf(wo, alpha, ux, uy)
    m_signed = _vscale(m, jnp.sign(wo[2]))
    wi_g = _vsub(_vscale(m_signed, 2.0 * _vdot(wo, m_signed)), wo)
    value_g, pdf_g = _conductor_eval_pdf(albedo, params, extra, wo, wi_g)

    wi_s = (-wo[0], -wo[1], wo[2])
    f_s = _conductor_fresnel(albedo, params, extra, wo[2])
    value_s = _vscale(f_s, 1.0 / jnp.maximum(jnp.abs(wi_s[2]), 1e-8))

    wi = _vwhere(is_specular, wi_s, wi_g)
    value = _vwhere(is_specular, value_s, value_g)
    pdf = jnp.where(is_specular, 1.0, pdf_g)
    spec_f = is_specular.astype(F32)
    return wi, value, pdf, spec_f


def _coated_eval_pdf(albedo, params, wo, wi):
    ior = jnp.maximum(params[1], 1.0 + 1e-4)
    same = _same_hemi(wo, wi)
    one = jnp.ones_like(ior)
    f_o, _, _ = _fresnel_dielectric(wo[2], one, ior)
    f_i, _, _ = _fresnel_dielectric(wi[2], one, ior)
    f_avg = (ior - 1.0) / (4.08567 + 1.00071 * ior)
    comp = (
        1.0 - f_avg * albedo[0],
        1.0 - f_avg * albedo[1],
        1.0 - f_avg * albedo[2],
    )
    s = INV_PI * ((1.0 - f_o) * (1.0 - f_i))
    base = (
        albedo[0] * s / jnp.maximum(comp[0], 1e-3),
        albedo[1] * s / jnp.maximum(comp[1], 1e-3),
        albedo[2] * s / jnp.maximum(comp[2], 1e-3),
    )
    value = _vwhere(same, base, _vzero(s))
    pdf = jnp.where(same, jnp.abs(wi[2]) * INV_PI, 0.0) * 0.5
    return value, pdf


def _coated_sample(albedo, params, wo, ux, uy, u_lobe):
    ior = jnp.maximum(params[1], 1.0 + 1e-4)
    one = jnp.ones_like(ior)
    f_o, _, _ = _fresnel_dielectric(wo[2], one, ior)
    pick_coat = u_lobe < 0.5
    wi_c = (-wo[0], -wo[1], wo[2])
    wi_b = _cosine_hemisphere(ux, uy)
    wi_b = _vwhere(wo[2] < 0.0, _negz(wi_b), wi_b)
    wi = _vwhere(pick_coat, wi_c, wi_b)
    value_b, pdf_b = _coated_eval_pdf(albedo, params, wo, wi)
    vc = f_o / jnp.maximum(jnp.abs(wi_c[2]), 1e-8)
    value = _vwhere(pick_coat, (vc, vc, vc), value_b)
    pdf = jnp.where(pick_coat, 0.5, pdf_b)
    return wi, value, pdf, pick_coat.astype(F32)


def _invisible_sample(wo):
    wi = _vneg(wo)
    v = 1.0 / jnp.maximum(jnp.abs(wi[2]), 1e-8)
    one = jnp.ones_like(v)
    return wi, (v, v, v), one, one


def _bsdf_sample(present, mtype, albedo, params, extra, wo, ux, uy, u_lobe):
    """Mirror of bsdf.sample: evaluate the present models, select by type.
    Returns (wi V3, value V3, pdf, specular f32)."""
    smooth = _roughness_to_alpha(params[0]) <= ALPHA_THRESHOLD
    candidates = []
    if DIFFUSE in present:
        candidates.append((DIFFUSE, _diffuse_sample(albedo, params, wo, ux, uy, u_lobe)))
    if DIELECTRIC in present:
        ws, vs, ps, ss = _dielectric_smooth_sample(albedo, params, wo, u_lobe)
        wr, vr, pr, sr = _dielectric_rough_sample(albedo, params, wo, ux, uy, u_lobe)
        diel = (
            _vwhere(smooth, ws, wr),
            _vwhere(smooth, vs, vr),
            jnp.where(smooth, ps, pr),
            jnp.where(smooth, ss, sr),
        )
        candidates.append((DIELECTRIC, diel))
    if CONDUCTOR in present:
        candidates.append((CONDUCTOR, _conductor_sample(albedo, params, extra, wo, ux, uy)))
    if COATED_DIFFUSE in present:
        candidates.append((COATED_DIFFUSE, _coated_sample(albedo, params, wo, ux, uy, u_lobe)))
    if INVISIBLE in present:
        candidates.append((INVISIBLE, _invisible_sample(wo)))

    if len(candidates) == 1 and EMISSIVE not in present:
        return candidates[0][1]
    z = jnp.zeros_like(wo[0])
    wi, value, pdf, spec = (z, z, z), (z, z, z), z, z
    for tid, (cw, cv, cp, cs) in candidates:
        m = mtype == float(tid)
        wi = _vwhere(m, cw, wi)
        value = _vwhere(m, cv, value)
        pdf = jnp.where(m, cp, pdf)
        spec = jnp.where(m, cs, spec)
    return wi, value, pdf, spec


def _bsdf_eval_pdf(present, mtype, albedo, params, extra, wo, wi):
    """Mirror of bsdf.evaluate + bsdf.pdf (non-delta lobes only)."""
    smooth = _roughness_to_alpha(params[0]) <= ALPHA_THRESHOLD
    rows = []
    if DIFFUSE in present:
        rows.append((DIFFUSE, _diffuse_eval(albedo, params, wo, wi), _diffuse_pdf(params, wo, wi)))
    if DIELECTRIC in present:
        v, p = _dielectric_rough_eval_pdf(albedo, params, wo, wi)
        v = _vwhere(smooth, _vzero(p), v)
        p = jnp.where(smooth, 0.0, p)
        rows.append((DIELECTRIC, v, p))
    if CONDUCTOR in present:
        v, p = _conductor_eval_pdf(albedo, params, extra, wo, wi)
        spec = jnp.clip(params[0] * 0.75, 0.0, 1.0) ** 2 < ALPHA_THRESHOLD
        rows.append((CONDUCTOR, _vwhere(spec, _vzero(p), v), jnp.where(spec, 0.0, p)))
    if COATED_DIFFUSE in present:
        v, p = _coated_eval_pdf(albedo, params, wo, wi)
        rows.append((COATED_DIFFUSE, v, p))
    z = jnp.zeros_like(wo[0])
    value, pdf = (z, z, z), z
    for tid, v, p in rows:
        m = mtype == float(tid)
        value = _vwhere(m, v, value)
        pdf = jnp.where(m, p, pdf)
    return value, pdf


# ---------------------------------------------------------------------------
# in-kernel scene queries
# ---------------------------------------------------------------------------


def _lookup(tableT, ids_row, n_cols):
    """One-hot MXU row lookup: tableT (R, C) x onehot(ids) -> (R, BR).
    Exact at HIGHEST precision (the in-kernel form of
    utils/vec.small_table_lookup). ids_row must be clamped to [0, n_cols)."""
    br = ids_row.shape[-1]
    ids_i = ids_row.astype(jnp.int32)  # ids are small exact floats
    acc = None
    for c in range(0, n_cols, PRIM_BLOCK):
        w = min(PRIM_BLOCK, n_cols - c)
        # Mosaic only lowers integer iota
        base = jax.lax.broadcasted_iota(jnp.int32, (w, br), 0) + c
        onehot = (ids_i == base).astype(F32)
        part = jax.lax.dot_general(
            tableT[:, c : c + w], onehot,
            (((1,), (0,)), ((), ())),
            preferred_element_type=F32,
            precision=jax.lax.Precision.HIGHEST,
        )
        acc = part if acc is None else acc + part
    return acc


def _lookup_1p(tableT, ids_row, n_cols):
    """_lookup at DEFAULT (single-pass) matmul precision: EXACT when the
    table's values are bf16-representable (0/1 one-hot weights, values
    already bf16) — the texture atlas is quantized so at prep. 6x cheaper
    than the HIGHEST-precision form on big tables."""
    br = ids_row.shape[-1]
    ids_i = ids_row.astype(jnp.int32)
    acc = None
    for c in range(0, n_cols, PRIM_BLOCK):
        w = min(PRIM_BLOCK, n_cols - c)
        base = jax.lax.broadcasted_iota(jnp.int32, (w, br), 0) + c
        onehot = (ids_i == base).astype(tableT.dtype)
        part = jax.lax.dot_general(
            tableT[:, c : c + w], onehot,
            (((1,), (0,)), ((), ())),
            preferred_element_type=F32,
        )
        acc = part if acc is None else acc + part
    return acc


def _matan2(y, x):
    """Mosaic-safe atan2 (neither atan nor acos lower on TPU Pallas):
    octant reduction + an 11-term odd minimax polynomial on [0, 1]
    (max error ~1e-6 rad). Used only for equirect sphere texture uv —
    a <=1e-6 uv deviation from XLA's arctan2 can flip a texel at a
    boundary on rare lanes; the megakernel parity tests tolerate it."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.maximum(hi, 1e-30)
    z = t * t
    r = t * (
        0.99997726
        + z * (-0.33262347
               + z * (0.19354346
                      + z * (-0.11643287
                             + z * (0.05265332 + z * -0.01172120))))
    )
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0.0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0.0, -r, r)


def _macos(z):
    """Mosaic-safe arccos via _matan2: acos(z) = atan2(sqrt(1-z^2), z)."""
    return _matan2(jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0)), z)


def _tex_bilinear(texT, a_count, res, tid, u_g, v_g, grid, row):
    """Repeat-wrapped bilinear over the shared quantized atlas — the
    in-kernel form of scene_ops._sample_atlas, texel-for-texel identical:
    0/1 one-hot fetches are exact on the bf16-representable values and the
    interpolation arithmetic runs in f32 with the same formulas. texT rows
    are channel-major (row = c*res + x), cols texture-major (tex*res + y).
    `tid` must be pre-clamped to [0, a_count); returns a (3,) grid tuple."""
    rf = np.float32(res)
    u = (u_g % 1.0) * rf - 0.5
    v = (v_g % 1.0) * rf - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0w = u0 % rf
    u1w = (u0 + 1.0) % rf
    v0w = v0 % rf
    v1w = (v0 + 1.0) % rf
    base = tid * rf
    rows0 = _lookup_1p(texT, row(base + v0w), a_count * res)  # (3R, BR)
    rows1 = _lookup_1p(texT, row(base + v1w), a_count * res)
    rows0 = rows0.astype(F32)
    rows1 = rows1.astype(F32)
    br = rows0.shape[-1]
    xi = jax.lax.broadcasted_iota(jnp.int32, (res, br), 0)
    x0 = jnp.broadcast_to(row(u0w).astype(jnp.int32), (res, br))
    x1 = jnp.broadcast_to(row(u1w).astype(jnp.int32), (res, br))
    fu_b = jnp.broadcast_to(row(fu), (res, br))
    # one weight plane shared by the 3 channel slices: w(x) = (1-fu) at
    # x0 + fu at x1 (x0 == x1 can't happen: res >= 2)
    wsel = jnp.where(xi == x0, 1.0 - fu_b, 0.0) + jnp.where(
        xi == x1, fu_b, 0.0
    )
    out = []
    fv_r = row(fv)
    for c in range(3):
        top = jnp.sum(rows0[c * res : (c + 1) * res] * wsel, axis=0,
                      keepdims=True)
        bot = jnp.sum(rows1[c * res : (c + 1) * res] * wsel, axis=0,
                      keepdims=True)
        out.append(grid(top * (1.0 - fv_r) + bot * fv_r))
    return tuple(out)


def _tree_importance(tr, x):
    """Importance of both packed children from a fetched light-tree node
    row `tr` (24 grid-shaped rows), the component form of
    aggregation/light_tree._child_importance — same formulas in the same
    order so the descent's draws bit-match the XLA wavefront."""

    def one(b):
        c = (tr[b + 0], tr[b + 1], tr[b + 2])
        r = tr[b + 3]
        ax = (tr[b + 4], tr[b + 5], tr[b + 6])
        cos_o = tr[b + 7]
        cos_e = tr[b + 8]
        pw = tr[b + 9]
        delta = _vsub(c, x)
        d2 = _vdot(delta, delta)
        d = jnp.sqrt(jnp.maximum(d2, 1e-12))
        wi = _vscale(delta, 1.0 / d)
        cos_i = jnp.clip(_vdot(ax, _vneg(wi)), -1.0, 1.0)
        sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
        cos_oc = jnp.clip(cos_o, -1.0, 1.0)
        sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_oc * cos_oc, 0.0))
        sin_u = jnp.clip(r / d, 0.0, 1.0)
        cos_u = jnp.sqrt(jnp.maximum(1.0 - sin_u * sin_u, 0.0))
        cos_ou = cos_oc * cos_u - sin_o * sin_u
        sin_ou = sin_o * cos_u + cos_oc * sin_u
        sum_ge_pi = cos_oc <= -cos_u
        cos_p = cos_i * cos_ou + sin_i * sin_ou
        inside = sum_ge_pi | (cos_i >= cos_ou)
        cos_p_eff = jnp.where(inside, 1.0, cos_p)
        falloff = jnp.where(
            cos_p_eff >= cos_e, jnp.maximum(cos_p_eff, 0.0), 0.0
        )
        d2c = jnp.maximum(d2, (0.5 * r) ** 2)
        return pw * falloff / d2c + pw * 1e-9

    return one(0), one(_F_TREE)


_F_TREE = 12  # floats per packed child (light_tree._F)
_TREE_ROWS = 24  # both children per node row
# tree-light table rows: 0 light record, 1 path bitmask, 2 leaf depth
_TL_ROWS = 3


def _tree_node_rows(treeT, k_pad, node_row, grid):
    """Fetch each lane's light-tree node (24 fields) by one-hot lookup."""
    trow = _lookup(treeT, node_row, k_pad)
    return [grid(trow[i : i + 1]) for i in range(_TREE_ROWS)]


def _tree_pick(treeT, k_pad, tree_depth, u_fin, x, grid, row):
    """Probabilistic descent from shading points x with u_fin in [0,1):
    returns (leaf id, pmf) — the in-kernel mirror of light_tree.pick."""
    z = jnp.zeros_like(u_fin)
    node = z
    pmf = jnp.ones_like(u_fin)
    out = jnp.full_like(u_fin, -1.0)
    uu = u_fin
    for _ in range(tree_depth):
        live = out < 0.0
        tr = _tree_node_rows(treeT, k_pad, row(jnp.maximum(node, 0.0)), grid)
        imp0, imp1 = _tree_importance(tr, x)
        total = jnp.maximum(imp0 + imp1, 1e-30)
        p_left = imp0 / total
        go_right = uu >= p_left
        p_pick = jnp.where(go_right, 1.0 - p_left, p_left)
        uu_next = jnp.where(
            go_right,
            (uu - p_left) / jnp.maximum(1.0 - p_left, 1e-12),
            uu / jnp.maximum(p_left, 1e-12),
        )
        uu_next = jnp.clip(uu_next, 0.0, 1.0 - 1e-7)
        is_leaf = jnp.where(go_right, tr[_F_TREE + 10], tr[10]) > 0.5
        nxt = jnp.where(go_right, tr[_F_TREE + 11], tr[11])
        pmf = jnp.where(live, pmf * p_pick, pmf)
        out = jnp.where(live & is_leaf, nxt, out)
        node = jnp.where(live & ~is_leaf, nxt, node)
        uu = jnp.where(live, uu_next, uu)
    return jnp.maximum(out, 0.0), pmf


def _tree_pmf(treeT, k_pad, tree_depth, path, depth, x, grid, row):
    """Replay the branch decisions in `path` (f32 bitmask rows) from
    shading points x — the in-kernel mirror of light_tree.pmf_of_light."""
    node = jnp.zeros_like(path)
    pmf = jnp.ones_like(path)
    path_i = path.astype(jnp.int32)
    for d_lvl in range(tree_depth):
        live = float(d_lvl) < depth
        tr = _tree_node_rows(treeT, k_pad, row(node), grid)
        imp0, imp1 = _tree_importance(tr, x)
        total = jnp.maximum(imp0 + imp1, 1e-30)
        go_right = ((path_i >> d_lvl) & 1) > 0
        p = jnp.where(go_right, imp1, imp0) / total
        nxt = jnp.where(go_right, tr[_F_TREE + 11], tr[11])
        node = jnp.where(live, nxt, node)
        pmf = jnp.where(live, pmf * p, pmf)
    return pmf


def _trace_rows(rows, chunks, o, d, tmax, ign, has_tri, has_sph):
    """Closest-hit over the VMEM-resident prim rows; (1, BR) in/out.
    Same merge as ops/pallas_intersect._trace_kernel."""
    best_t, best_p = tmax, jnp.full_like(tmax, -1.0)
    best_u = jnp.zeros_like(tmax)
    best_v = jnp.zeros_like(tmax)
    for lo, hi in chunks:
        blk = [r[:, lo:hi] for r in rows]
        t, u, v, pid = _chunk_hits(
            blk, float(lo), o[0], o[1], o[2], d[0], d[1], d[2], ign, has_tri, has_sph
        )
        tm = jnp.min(t, axis=0, keepdims=True)
        sel = t <= tm
        pm = jnp.min(jnp.where(sel, pid, 3.4e38), axis=0, keepdims=True)
        um = jnp.sum(jnp.where(sel & (pid == pm), u, 0.0), axis=0, keepdims=True)
        vm = jnp.sum(jnp.where(sel & (pid == pm), v, 0.0), axis=0, keepdims=True)
        closer = tm < best_t
        best_t = jnp.where(closer, tm, best_t)
        best_p = jnp.where(closer, pm, best_p)
        best_u = jnp.where(closer, um, best_u)
        best_v = jnp.where(closer, vm, best_v)
    return best_t, best_p, best_u, best_v


def _occlude_rows(rows, chunks, o, d, tmax, ign, has_tri, has_sph):
    """Any-hit over the prim rows; returns (1, BR) f32 0/1."""
    blocked = jnp.zeros_like(tmax)
    for lo, hi in chunks:
        blk = [r[:, lo:hi] for r in rows]
        t, _, _, _ = _chunk_hits(
            blk, float(lo), o[0], o[1], o[2], d[0], d[1], d[2], ign, has_tri, has_sph
        )
        hit = jnp.any(t < tmax, axis=0, keepdims=True)
        blocked = jnp.where(hit, 1.0, blocked)
    return blocked


def _hier_walk(bounds_ref, codes_ref, fat_hbm, pscratch, wstate, stack,
               dstate, sem0, sem1, o, d, tmax, ign, *, root_code, n_sub,
               has_tri, has_sph, any_hit):
    """Packet BVH walk over DMA-streamed fat chunks, inline inside the
    megakernel iteration (the traversal mirrors ops/pallas_hier._hier_kernel;
    state lives in the `wstate` VMEM scratch so pl.when-guarded drains can
    mutate it inside the while body). o/d/tmax/ign are (1, BR) rows.

    Closest-hit mode returns (t, p, u, v, [17 shading rows]) — the shading
    rows are the winning prim's SP_ROWS, captured during the merge.
    Any-hit mode returns the blocked row."""
    inv = lambda x: jnp.where(
        jnp.abs(x) < 1e-12, 1e12 * jnp.where(x < 0, -1.0, 1.0), 1.0 / x
    )
    ox, oy, oz = o
    dx, dy, dz = d
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    if any_hit:
        wstate[0] = jnp.zeros((RAY_BLOCK,), F32)
    else:
        wstate[0] = tmax.reshape(-1)
        wstate[1] = jnp.full((RAY_BLOCK,), -1.0, F32)
        for k in range(2, 4 + SP_ROWS):
            wstate[k] = jnp.zeros((RAY_BLOCK,), F32)

    alive = jnp.any(tmax > 0.0)
    stack[0] = root_code
    sp0 = jnp.where(alive, 1, 0)
    dstate[0] = -1
    dstate[1] = 0

    def drain():
        pend = dstate[0]
        buf = dstate[1]

        @pl.when(buf == 0)
        def _():
            pltpu.make_async_copy(fat_hbm.at[pend], pscratch.at[0], sem0).wait()

        @pl.when(buf == 1)
        def _():
            pltpu.make_async_copy(fat_hbm.at[pend], pscratch.at[1], sem1).wait()

        src = pscratch[buf]  # (FAT_ROWS, HCHUNK)
        if any_hit:
            prev = wstate[0].reshape(1, -1)
            lim = jnp.where(prev > 0.5, -1.0, tmax)
        else:
            best_t = wstate[0].reshape(1, -1)
            best_p = wstate[1].reshape(1, -1)
            best_u = wstate[2].reshape(1, -1)
            best_v = wstate[3].reshape(1, -1)
            best_a = [wstate[4 + k].reshape(1, -1) for k in range(SP_ROWS)]
        for s in range(n_sub):
            blk = [src[i : i + 1, s * 128 : (s + 1) * 128] for i in range(10)]
            k_base = (pend * HCHUNK + s * 128).astype(F32)
            t, u, v, pid = _chunk_hits(
                blk, k_base, ox, oy, oz, dx, dy, dz, ign, has_tri, has_sph
            )
            if any_hit:
                hit = jnp.any(t < lim, axis=0, keepdims=True)
                prev = jnp.where(hit, 1.0, prev)
            else:
                tm = jnp.min(t, axis=0, keepdims=True)
                sel = t <= tm
                pm = jnp.min(jnp.where(sel, pid, _INF), axis=0, keepdims=True)
                sel2 = sel & (pid == pm)
                um = jnp.sum(jnp.where(sel2, u, 0.0), axis=0, keepdims=True)
                vm = jnp.sum(jnp.where(sel2, v, 0.0), axis=0, keepdims=True)
                closer = tm < best_t
                best_t = jnp.where(closer, tm, best_t)
                best_p = jnp.where(closer, pm, best_p)
                best_u = jnp.where(closer, um, best_u)
                best_v = jnp.where(closer, vm, best_v)
                for k in range(SP_ROWS):
                    col = jnp.transpose(
                        src[FAT_ATTR + k : FAT_ATTR + k + 1, s * 128 : (s + 1) * 128]
                    )  # (128, 1) prim attr on sublanes
                    am = jnp.sum(jnp.where(sel2, col, 0.0), axis=0, keepdims=True)
                    best_a[k] = jnp.where(closer, am, best_a[k])
        if any_hit:
            wstate[0] = prev.reshape(-1)
        else:
            wstate[0] = best_t.reshape(-1)
            wstate[1] = best_p.reshape(-1)
            wstate[2] = best_u.reshape(-1)
            wstate[3] = best_v.reshape(-1)
            for k in range(SP_ROWS):
                wstate[4 + k] = best_a[k].reshape(-1)

    def body(sp):
        code = stack[sp - 1]
        sp = sp - 1
        is_leaf = code < 0
        e = -(code + 1)

        if any_hit:
            blocked = wstate[0].reshape(1, -1)
            limit = jnp.where(blocked > 0.5, -1.0, tmax)
        else:
            limit = wstate[0].reshape(1, -1)

        node = jnp.maximum(code, 0)
        base = node * 12

        def slab(side):
            b = base + side * 6
            t0x = (bounds_ref[b + 0] - ox) * ix
            t0y = (bounds_ref[b + 1] - oy) * iy
            t0z = (bounds_ref[b + 2] - oz) * iz
            t1x = (bounds_ref[b + 3] - ox) * ix
            t1y = (bounds_ref[b + 4] - oy) * iy
            t1z = (bounds_ref[b + 5] - oz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            ok = (tn <= tf) & (tf > 0.0) & (tn < limit)
            return jnp.any(ok), jnp.min(jnp.where(ok, tn, _INF))

        h0, tn0 = slab(0)
        h1, tn1 = slab(1)
        h0 = h0 & ~is_leaf
        h1 = h1 & ~is_leaf
        c0 = codes_ref[2 * node]
        c1 = codes_ref[2 * node + 1]

        near0 = tn0 <= tn1
        far_code = jnp.where(near0, c1, c0)
        far_hit = jnp.where(near0, h1, h0)
        near_code = jnp.where(near0, c0, c1)
        near_hit = jnp.where(near0, h0, h1)

        @pl.when(far_hit)
        def _():
            stack[sp] = far_code

        sp1 = sp + far_hit.astype(jnp.int32)

        @pl.when(near_hit)
        def _():
            stack[sp1] = near_code

        sp2 = sp1 + near_hit.astype(jnp.int32)

        @pl.when(is_leaf)
        def _():
            chunk = e
            pend = dstate[0]
            nb = jnp.where(pend >= 0, 1 - dstate[1], 0)

            @pl.when(nb == 0)
            def _():
                pltpu.make_async_copy(fat_hbm.at[chunk], pscratch.at[0], sem0).start()

            @pl.when(nb == 1)
            def _():
                pltpu.make_async_copy(fat_hbm.at[chunk], pscratch.at[1], sem1).start()

            pl.when(pend >= 0)(drain)
            dstate[0] = chunk
            dstate[1] = nb

        if any_hit:
            done = ~jnp.any((wstate[0].reshape(1, -1) < 0.5) & (tmax > 0.0))
            sp2 = jnp.where(done, 0, sp2)
        return sp2

    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
    pl.when(dstate[0] >= 0)(drain)

    if any_hit:
        return wstate[0].reshape(1, -1)
    return (
        wstate[0].reshape(1, -1),
        wstate[1].reshape(1, -1),
        wstate[2].reshape(1, -1),
        wstate[3].reshape(1, -1),
        [wstate[4 + k].reshape(1, -1) for k in range(SP_ROWS)],
    )


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _mega_kernel(
    cam_ref, seed_ref,
    pid_ref, pxf_ref, pyf_ref, s0_ref, valid_ref,
    *table_refs,
    outs,
    scratch,
    static,
):
    (count, bounce_limit, survivability, width, height, present,
     n_chunks, chunk_w, has_tri, has_sph, n_lights, l_pad, m_pad, e_pad,
     has_point, has_dir, has_amb, has_emissive, sp_pad,
     hier, hier_root, hier_nsub,
     has_tree, tree_depth, t_pad, f_pad,
     tex_on, tex_res, a_count, has_ntex, has_rtex, k_slots) = static

    if hier:
        # large-scene path: fat chunks streamed from HBM during the walk
        bounds_ref, codes_ref = table_refs[0], table_refs[1]
        fat_hbm = table_refs[2]
        matT = table_refs[3][:]
        lightT = table_refs[4][:]
        epackT = table_refs[5][:]
        treeT = table_refs[6][:] if has_tree else None
        tlT = table_refs[7][:] if has_tree else None
        (pscratch, wstate, stack, dstate, sem0, sem1) = scratch
        rows = spT = chunks = None
    else:
        rows = [r[:] for r in table_refs[:10]]  # (1, P) prim component rows
        spT = table_refs[10][:]
        matT = table_refs[11][:]
        lightT = table_refs[12][:]
        epackT = table_refs[13][:]
        treeT = table_refs[14][:] if has_tree else None
        tlT = table_refs[15][:] if has_tree else None
        texT = table_refs[16 if has_tree else 14][:] if tex_on else None
        chunks = [(c * chunk_w, (c + 1) * chunk_w) for c in range(n_chunks)]

    S = (1, 8, 128)
    row = lambda x: x.reshape(1, RAY_BLOCK)
    grid = lambda r: r.reshape(S)

    K = k_slots
    slot_row = lambda ref, j: ref[:, j].reshape(S)
    pid_j = [slot_row(pid_ref, j) for j in range(K)]
    pxf_j = [slot_row(pxf_ref, j) for j in range(K)]
    pyf_j = [slot_row(pyf_ref, j) for j in range(K)]
    s0_j = [slot_row(s0_ref, j) for j in range(K)]
    valid_j = [slot_row(valid_ref, j) for j in range(K)]
    seed = seed_ref[0]

    pos = (cam_ref[C_POS], cam_ref[C_POS + 1], cam_ref[C_POS + 2])
    rot = [[cam_ref[C_ROT + 3 * k + j] for j in range(3)] for k in range(3)]
    fl = cam_ref[C_FL]
    lens_r = cam_ref[C_LENS]
    focal = cam_ref[C_FOCAL]
    amb_all = (cam_ref[C_AMB_ALL], cam_ref[C_AMB_ALL + 1], cam_ref[C_AMB_ALL + 2])
    amb_cam = (cam_ref[C_AMB_CAM], cam_ref[C_AMB_CAM + 1], cam_ref[C_AMB_CAM + 2])
    amb_pmf = cam_ref[C_AMB_PMF]
    total_power = cam_ref[C_TOTAL_POWER]  # already max(sum, 1e-20)
    p_inf = cam_ref[C_P_INF]
    sum_inf = cam_ref[C_SUM_INF]  # already max(sum, 1e-20)

    size_r = np.float32(1.0) / np.float32(width)
    aspect_y = np.float32(height) / np.float32(width)

    def stream_for(sample_rel, pid, s0):
        return SampleStream(pixel_id=pid, sample_id=s0 + sample_rel, seed=seed)

    def spawn(sample_rel, pid, pxf, pyf, s0):
        """Mirror of scene/cameras.spawn_rays (PERSPECTIVE incl. DoF)."""
        s = stream_for(sample_rel, pid, s0)
        sx, sy = s.next_2d_parts(0)
        lx, ly = s.next_2d_parts(1)
        x = (pxf + sx) * size_r - 0.5
        y = (pyf + sy) * size_r - aspect_y * 0.5
        flb = jnp.full_like(x, 1.0) * fl
        local_dir = (x, y, flb)
        has_dof = (lens_r > 0.0) & (focal > 0.0)
        dkx, dky = _concentric_disk(lx, ly)
        lens = (dkx * lens_r, dky * lens_r, jnp.zeros_like(x))
        focus_scale = focal / fl
        focus = (x * focus_scale, y * focus_scale, jnp.full_like(x, 1.0) * focal)
        local_origin = _vwhere(has_dof, lens, _vzero(x))
        local_dir = _vwhere(has_dof, _vsub(focus, local_origin), local_dir)
        o = tuple(
            (rot[k][0] * local_origin[0] + rot[k][1] * local_origin[1])
            + rot[k][2] * local_origin[2] + pos[k]
            for k in range(3)
        )
        d = tuple(
            (rot[k][0] * local_dir[0] + rot[k][1] * local_dir[1])
            + rot[k][2] * local_dir[2]
            for k in range(3)
        )
        norm = jnp.sqrt(_vdot(d, d))
        d = _vscale(d, 1.0 / jnp.maximum(norm, 1e-20))
        return o, d

    zero = jnp.zeros(S, F32)
    one = jnp.ones(S, F32)
    zero_u = jnp.zeros(S, U32)

    o0, d0 = spawn(zero_u, pid_j[0], pxf_j[0], pyf_j[0], s0_j[0])

    # K-slot regeneration (r4): each lane serves K pixels back to back, so
    # the per-block tail (the wait for the slowest lane's total work) is
    # averaged over K pixels' path-length sums — at spp=64 the max-lane
    # tail was ~20-30% of block iterations. Identity (pid/pxy/s0) rides in
    # state and switches rows when a slot's sample budget completes.
    state = (
        tuple((zero, zero, zero) for _ in range(K)),  # s_sum per slot
        tuple((zero, zero, zero) for _ in range(K)),  # s_sq per slot
        zero_u,              # sample (relative, within the current slot)
        1.0 - valid_j[0],    # lane_done f32 (padded lanes start done)
        (zero, zero, zero),  # radiance
        (one, one, one),     # throughput
        o0, d0,
        zero_u,              # depth
        zero,                # prev_pdf
        one,                 # prev_specular f32
        o0,                  # prev_point
        -one,                # ignore (sorted prim id, f32)
        zero,                # slot (f32 0..K-1)
        pid_j[0], pxf_j[0], pyf_j[0], s0_j[0],  # current-slot identity
    )

    def cond(st):
        return jnp.any(st[3] < 0.5)

    def body(st):
        (s_sum, s_sq, sample, lane_done, radiance, throughput, o, d,
         depth, prev_pdf, prev_spec, prev_point, ignore,
         slot_f, pid, pxf, pyf, s0) = st
        live = lane_done < 0.5
        stream = stream_for(sample, pid, s0)

        # --- trace the pending ray (path_step 'advance') ---
        seg_t = jnp.where(live, _INF, 0.0)
        o_r = tuple(row(c) for c in o)
        d_r = tuple(row(c) for c in d)
        if hier:
            t_r, p_r, u_r, v_r, srows = _hier_walk(
                bounds_ref, codes_ref, fat_hbm, pscratch, wstate, stack,
                dstate, sem0, sem1, o_r, d_r, row(seg_t), row(ignore),
                root_code=hier_root, n_sub=hier_nsub,
                has_tri=has_tri, has_sph=has_sph, any_hit=False,
            )
            sr = [grid(s) for s in srows]
        else:
            t_r, p_r, u_r, v_r = _trace_rows(
                rows, chunks, o_r, d_r, row(seg_t), row(ignore), has_tri, has_sph
            )
            prim_row = jnp.maximum(p_r, 0.0)
            srow = _lookup(spT, prim_row, sp_pad)  # (SP_ROWS[+6 uv], BR)
            sr = [
                grid(srow[i : i + 1])
                for i in range(SP_ROWS + (6 if tex_on else 0))
            ]
        hit_t = grid(t_r)
        hit_p = grid(p_r)
        hit_u = grid(u_r)
        hit_v = grid(v_r)
        found = live & (hit_p >= 0.0)
        prim_c = jnp.maximum(hit_p, 0.0)

        # --- interact (scene_ops.interact, sans textures) ---
        point = _vadd(o, _vscale(d, hit_t))
        w_bc = 1.0 - hit_u - hit_v
        tri_geo = (sr[0], sr[1], sr[2])
        tri_shade = _vnormalize(
            (
                w_bc * sr[3] + hit_u * sr[6] + hit_v * sr[9],
                w_bc * sr[4] + hit_u * sr[7] + hit_v * sr[10],
                w_bc * sr[5] + hit_u * sr[8] + hit_v * sr[11],
            )
        )
        sph_geo = _vnormalize(_vsub(point, tri_geo))  # rows 0:3 = center
        is_sph = sr[14] > 0.5
        geo_n = _vwhere(is_sph, sph_geo, tri_geo)
        shade_n = _vwhere(is_sph, sph_geo, tri_shade)
        mat_row = row(sr[12])
        mrow = _lookup(matT, mat_row, m_pad)
        mr = [
            grid(mrow[i : i + 1])
            for i in range(MT_ROWS + (4 if tex_on else 0))
        ]
        albedo = (mr[0], mr[1], mr[2])
        params = (mr[3], mr[4], mr[5], mr[6])
        extra = (mr[7], mr[8], mr[9])
        mtype = mr[10]
        if INVISIBLE in present:
            backface = _vdot(geo_n, _vneg(d)) < 0.0
            mtype = jnp.where(backface & (mr[11] > 0.5), float(INVISIBLE), mtype)

        if tex_on:
            # --- interact's texture stage (scene_ops.interact), op-for-op:
            # barycentric tri uv (sp rows 17..22) / equirect sphere uv,
            # then albedo override, tangent-space normal perturbation and
            # roughness override — all through the shared quantized atlas
            # so every texel matches the XLA wavefront bitwise ---
            uv_u = w_bc * sr[17] + hit_u * sr[19] + hit_v * sr[21]
            uv_v = w_bc * sr[18] + hit_u * sr[20] + hit_v * sr[22]
            if has_sph:
                pl_ = _vsub(point, tri_geo)  # rows 0:3 = center for spheres
                rad = jnp.maximum(sr[3], 1e-20)  # radius rides row 3
                pn = (pl_[0] / rad, pl_[1] / rad, pl_[2] / rad)
                theta = _macos(jnp.clip(pn[1], -1.0, 1.0))
                phi = _matan2(pn[0], pn[2])
                uv_u = jnp.where(is_sph, phi * INV_TAU + 0.5, uv_u)
                uv_v = jnp.where(is_sph, 1.0 - theta * INV_PI, uv_v)
            tid_max = np.float32(max(a_count - 1, 0))
            tid = mr[12]
            t_rgb = _tex_bilinear(
                texT, a_count, tex_res,
                jnp.clip(row(tid), 0.0, tid_max), row(uv_u), row(uv_v),
                grid, row,
            )
            has_t = tid >= 0.0
            albedo = tuple(
                jnp.where(has_t, t_rgb[k], albedo[k]) for k in range(3)
            )
            if has_ntex:
                ntid = mr[13]
                n_rgb = _tex_bilinear(
                    texT, a_count, tex_res,
                    jnp.clip(row(ntid), 0.0, tid_max), row(uv_u), row(uv_v),
                    grid, row,
                )
                inten = mr[14]
                t_, b_ = _frame(shade_n)
                tn = tuple(n_rgb[k] * 2.0 - 1.0 for k in range(3))
                pert = _vnormalize(
                    _vadd(
                        _vadd(
                            _vscale(t_, tn[0] * inten),
                            _vscale(b_, tn[1] * inten),
                        ),
                        _vscale(shade_n, jnp.maximum(tn[2], 0.1)),
                    )
                )
                shade_n = _vwhere(ntid >= 0.0, pert, shade_n)
            if has_rtex:
                rtid = mr[15]
                r_rgb = _tex_bilinear(
                    texT, a_count, tex_res,
                    jnp.clip(row(rtid), 0.0, tid_max), row(uv_u), row(uv_v),
                    grid, row,
                )
                rough = (r_rgb[0] + r_rgb[1] + r_rgb[2]) / 3.0
                params = (
                    jnp.where(rtid >= 0.0, rough, params[0]),
                    params[1], params[2], params[3],
                )

        # --- emission at the hit, MIS vs NEE (path_step) ---
        wo = _vneg(d)
        facing = _vdot(geo_n, wo) > 0.0
        emitted = _vwhere(
            facing & (mtype == float(EMISSIVE)), albedo, _vzero(mtype)
        )
        hit_rec = sr[15]
        if has_tree:
            # forward-MIS pmf via tree replay (scene_ops.light_pmf): the
            # hit light is always finite, so pmf = replay * (1 - p_inf)
            hrow = _lookup(lightT, row(jnp.maximum(hit_rec, 0.0)), l_pad)
            tree_id = grid(hrow[12:13])
            tlrow = _lookup(tlT, row(jnp.maximum(tree_id, 0.0)), f_pad)
            path_bits = grid(tlrow[1:2])
            leaf_depth = grid(tlrow[2:3])
            p_tree = _tree_pmf(
                treeT, t_pad, tree_depth, path_bits, leaf_depth,
                prev_point, grid, row,
            )
            light_pm = jnp.where(
                (hit_rec >= 0.0) & (tree_id >= 0.0),
                p_tree * (1.0 - p_inf), 0.0,
            )
        else:
            light_pm = jnp.where(hit_rec >= 0.0, sr[16] / total_power, 0.0)
        delta_f = _vsub(point, prev_point)
        dist2_f = jnp.maximum(_vdot(delta_f, delta_f), 1e-12)
        cos_lf = jnp.abs(_vdot(geo_n, d))
        area_pdf = dist2_f / jnp.maximum(cos_lf * sr[13], 1e-12)
        fwd_pdf = light_pm * area_pdf
        em_w = jnp.where(prev_spec > 0.5, 1.0, _power_heuristic(prev_pdf, fwd_pdf))
        radiance = tuple(
            radiance[k]
            + jnp.where(found, throughput[k] * emitted[k] * em_w, 0.0)
            for k in range(3)
        )

        # --- miss: constant ambient, MIS vs ambient NEE ---
        inf_pdf = amb_pmf * (1.0 / (4.0 * np.pi))
        inf_w = jnp.where(prev_spec > 0.5, 1.0, _power_heuristic(prev_pdf, inf_pdf))
        escaped = live & ~(hit_p >= 0.0)
        is_camera = depth == 0
        radiance = tuple(
            radiance[k]
            + jnp.where(
                escaped,
                throughput[k]
                * jnp.where(is_camera, amb_cam[k], amb_all[k] * inf_w),
                0.0,
            )
            for k in range(3)
        )

        # --- shading frame + draws ---
        tangent, bitangent = _frame(shade_n)
        wo_local = _to_local(wo, tangent, bitangent, shade_n)
        dim = U32(CAMERA_DIMS) + U32(BOUNCE_DIM_STRIDE) * depth
        ubx, uby = stream.next_2d_parts(dim + U32(DIM_BSDF))
        u_lobe = stream.next_1d(dim + U32(DIM_LOBE))
        u_pick = stream.next_1d(dim + U32(DIM_LIGHT_PICK))
        ulx, uly = stream.next_2d_parts(dim + U32(DIM_LIGHT_SAMPLE))
        u_rr = stream.next_1d(dim + U32(DIM_RR))

        wi, bs_value, bs_pdf, bs_spec = _bsdf_sample(
            present, mtype, albedo, params, extra, wo_local, ubx, uby, u_lobe
        )
        cos_i = jnp.abs(wi[2])
        has_bounce = found & (bs_pdf > 0.0) & (depth < U32(bounce_limit))

        # --- NEE (path_step / scene_ops.pick_light + sample_light) ---
        do_nee = found & ~(bs_spec > 0.5)
        u_pick_r = row(u_pick)
        if has_tree:
            # two-stage pick (scene_ops.pick_light tree branch): infinite
            # lights by power CDF, finite lights by tree descent from the
            # shading point
            pick_inf_r = u_pick_r < p_inf
            u_inf = jnp.clip(
                u_pick_r / jnp.maximum(p_inf, 1e-12), 0.0, 1.0 - 1e-7
            )
            cdfi_col = jnp.transpose(lightT[11:12, :])  # (L, 1) pad 2.0
            idx_inf = jnp.sum(
                (cdfi_col <= u_inf).astype(F32), axis=0, keepdims=True
            )
            idx_inf = jnp.minimum(idx_inf, float(n_lights - 1))
            u_fin = jnp.clip(
                (u_pick_r - p_inf) / jnp.maximum(1.0 - p_inf, 1e-12),
                0.0, 1.0 - 1e-7,
            )
            leaf, pmf_tree = _tree_pick(
                treeT, t_pad, tree_depth, grid(u_fin), point, grid, row
            )
            tl = _lookup(tlT, row(leaf), f_pad)
            rec_fin = tl[0:1]  # (1, BR) tree leaf -> light record
            idx_f = jnp.where(pick_inf_r, idx_inf, rec_fin)
            lrow = _lookup(lightT, idx_f, l_pad)
            lr = [grid(lrow[i : i + 1]) for i in range(LT_ROWS)]
            kind = lr[0]
            pick_pmf = jnp.where(
                grid(pick_inf_r),
                lr[10] / sum_inf * p_inf,
                pmf_tree * (1.0 - p_inf),
            )
        else:
            # flat power-CDF pick (searchsorted right)
            cdf_col = jnp.transpose(lightT[1:2, :])  # (L, 1)
            idx_f = jnp.sum(
                (cdf_col <= u_pick_r).astype(F32), axis=0, keepdims=True
            )
            idx_f = jnp.minimum(idx_f, float(n_lights - 1))
            lrow = _lookup(lightT, idx_f, l_pad)
            lr = [grid(lrow[i : i + 1]) for i in range(LT_ROWS)]
            kind = lr[0]
            pick_pmf = lr[2] / total_power

        # per-kind light samples (mirror of scene_ops.sample_light)
        x_p = point
        if has_point:
            delta_p = _vsub((lr[3], lr[4], lr[5]), x_p)
            dist2_p = jnp.maximum(_vdot(delta_p, delta_p), 1e-12)
            dist_p = jnp.sqrt(dist2_p)
            wi_p = _vscale(delta_p, 1.0 / dist_p)
            rad_p = (lr[6] / dist2_p, lr[7] / dist2_p, lr[8] / dist2_p)
        if has_dir:
            wi_d = (-lr[3], -lr[4], -lr[5])
            rad_d = (lr[6], lr[7], lr[8])
        if has_amb:
            wi_a = _uniform_sphere(ulx, uly)
            amb_pdf_s = jnp.full_like(ulx, 1.0 / (4.0 * np.pi))
            rad_a = tuple(jnp.full_like(ulx, 1.0) * amb_all[k] for k in range(3))
        if has_emissive:
            # clip to the padded table (pad rows are zeroed and only ever
            # selected out; XLA clips to the true count — both in-range)
            e_idx = row(jnp.clip(lr[9], 0.0, float(e_pad - 1)))
            erow = _lookup(epackT, e_idx, e_pad)
            er = [grid(erow[i : i + 1]) for i in range(EP_ROWS)]
            b0, b1 = _uniform_triangle(ulx, uly)
            p_tri = (
                er[0] + b0 * er[3] + b1 * er[6],
                er[1] + b0 * er[4] + b1 * er[7],
                er[2] + b0 * er[5] + b1 * er[8],
            )
            n_tri = (er[9], er[10], er[11])
            sp_dir = _uniform_sphere(ulx, uly)
            p_sph = _vadd((er[0], er[1], er[2]), _vscale(sp_dir, er[3]))
            is_sph_e = er[16] > 0.5
            p_l = _vwhere(is_sph_e, p_sph, p_tri)
            n_l = _vwhere(is_sph_e, sp_dir, n_tri)
            area_e = er[15]
            delta_e = _vsub(p_l, x_p)
            dist2_e = jnp.maximum(_vdot(delta_e, delta_e), 1e-12)
            dist_e = jnp.sqrt(dist2_e)
            wi_e = _vscale(delta_e, 1.0 / dist_e)
            cos_l = _vdot(n_l, _vneg(wi_e))
            rad_e = _vwhere(cos_l > 0.0, (er[12], er[13], er[14]), _vzero(cos_l))
            pdf_e = dist2_e / jnp.maximum(jnp.abs(cos_l) * area_e, 1e-12)
            target_e = er[17]

        # branchless kind selection, same overwrite order as scene_ops.sel
        z3 = _vzero(kind)
        radiant, incident = z3, z3
        travel = jnp.zeros_like(kind)
        ls_pdf = jnp.zeros_like(kind)
        inf_row = jnp.full_like(kind, _INF)
        if has_point:
            m = kind == float(LIGHT_POINT)
            radiant = _vwhere(m, rad_p, radiant)
            incident = _vwhere(m, wi_p, incident)
            travel = jnp.where(m, dist_p, travel)
            ls_pdf = jnp.where(m, 1.0, ls_pdf)
        if has_dir:
            m = kind == float(LIGHT_DIRECTIONAL)
            radiant = _vwhere(m, rad_d, radiant)
            incident = _vwhere(m, wi_d, incident)
            travel = jnp.where(m, inf_row, travel)
            ls_pdf = jnp.where(m, 1.0, ls_pdf)
        if has_amb:
            m = kind == float(LIGHT_AMBIENT)
            radiant = _vwhere(m, rad_a, radiant)
            incident = _vwhere(m, wi_a, incident)
            travel = jnp.where(m, inf_row, travel)
            ls_pdf = jnp.where(m, amb_pdf_s, ls_pdf)
        if has_emissive:
            m = kind == float(LIGHT_EMISSIVE)
            radiant = _vwhere(m, rad_e, radiant)
            incident = _vwhere(m, wi_e, incident)
            travel = jnp.where(m, dist_e, travel)
            ls_pdf = jnp.where(m, pdf_e, ls_pdf)
        use_mis = (kind == float(LIGHT_AMBIENT)) | (kind == float(LIGHT_EMISSIVE))

        wi_l = _to_local(incident, tangent, bitangent, shade_n)
        f_l3, scatter_pdf_l = _bsdf_eval_pdf(
            present, mtype, albedo, params, extra, wo_local, wi_l
        )
        cos_s = jnp.abs(_vdot(shade_n, incident))
        f_l = _vscale(f_l3, cos_s)
        nee_pdf = pick_pmf * ls_pdf
        fr_pos = (
            (f_l[0] * radiant[0] > 0.0)
            | (f_l[1] * radiant[1] > 0.0)
            | (f_l[2] * radiant[2] > 0.0)
        )
        candidate = do_nee & (nee_pdf > 1e-12) & fr_pos
        shadow_o = _offset_origin(point, geo_n, incident)
        shadow_t = jnp.where(travel >= _INF, _INF, travel * (1.0 - 1e-3))
        shadow_t = jnp.where(candidate, shadow_t, 0.0)
        if hier:
            blocked = grid(
                _hier_walk(
                    bounds_ref, codes_ref, fat_hbm, pscratch, wstate, stack,
                    dstate, sem0, sem1,
                    tuple(row(c) for c in shadow_o),
                    tuple(row(c) for c in incident),
                    row(shadow_t), row(prim_c),
                    root_code=hier_root, n_sub=hier_nsub,
                    has_tri=has_tri, has_sph=has_sph, any_hit=True,
                )
            )
        else:
            blocked = grid(
                _occlude_rows(
                    rows, chunks,
                    tuple(row(c) for c in shadow_o),
                    tuple(row(c) for c in incident),
                    row(shadow_t), row(prim_c), has_tri, has_sph,
                )
            )
        visible = candidate & ~(blocked > 0.5)
        mis_w = jnp.where(use_mis, _power_heuristic(nee_pdf, scatter_pdf_l), 1.0)
        nee_scale = mis_w / jnp.maximum(nee_pdf, 1e-20)
        radiance = tuple(
            radiance[k]
            + jnp.where(visible, throughput[k] * (radiant[k] * f_l[k] * nee_scale), 0.0)
            for k in range(3)
        )

        # --- Russian roulette + bounce (path_step) ---
        wscale = cos_i / jnp.maximum(bs_pdf, 1e-20)
        new_tp = tuple(
            throughput[k] * jnp.where(has_bounce, bs_value[k] * wscale, 1.0)
            for k in range(3)
        )
        rr = jnp.clip(survivability * _luminance(new_tp), 0.0, 1.0)
        survived = u_rr < rr
        inv_rr = 1.0 / jnp.maximum(rr, 1e-20)
        new_tp = _vscale(new_tp, inv_rr)
        continues = has_bounce & survived
        wi_world = _to_world(wi, tangent, bitangent, shade_n)
        cont_o = _offset_origin(point, geo_n, wi_world)

        # --- regeneration (wavefront.sample_frame_wavefront body) ---
        path_done = live & ~continues
        rad_total = radiance[0] + radiance[1] + radiance[2]
        finite = jnp.isfinite(rad_total)
        bank = path_done & finite
        s_sum = tuple(
            tuple(
                s_sum[j][k]
                + jnp.where(bank & (slot_f == float(j)), radiance[k], 0.0)
                for k in range(3)
            )
            for j in range(K)
        )
        s_sq = tuple(
            tuple(
                s_sq[j][k]
                + jnp.where(
                    bank & (slot_f == float(j)),
                    radiance[k] * radiance[k], 0.0,
                )
                for k in range(3)
            )
            for j in range(K)
        )
        next_sample = sample + path_done.astype(U32)
        slot_done = path_done & (next_sample >= U32(count))
        if K > 1:
            # roll the lane onto its next pixel slot; tail padding lives
            # only in the trailing slots (slot-major layout), so a switch
            # to an invalid slot ends the lane
            new_slot = slot_f + slot_done.astype(F32)
            switch = slot_done & (new_slot < float(K))
            pid_n, pxf_n, pyf_n, s0_n = pid, pxf, pyf, s0
            valid_n = jnp.ones_like(slot_f)
            for j in range(1, K):
                sel = switch & (new_slot == float(j))
                pid_n = jnp.where(sel, pid_j[j], pid_n)
                pxf_n = jnp.where(sel, pxf_j[j], pxf_n)
                pyf_n = jnp.where(sel, pyf_j[j], pyf_n)
                s0_n = jnp.where(sel, s0_j[j], s0_n)
                valid_n = jnp.where(sel, valid_j[j], valid_n)
            lane_done = jnp.maximum(
                lane_done,
                jnp.where(
                    slot_done & (~switch | (valid_n < 0.5)), 1.0, 0.0
                ),
            )
            next_sample = jnp.where(switch, U32(0), next_sample)
            slot_f = new_slot
        else:
            pid_n, pxf_n, pyf_n, s0_n = pid, pxf, pyf, s0
            lane_done = jnp.maximum(lane_done, slot_done.astype(F32))
        respawn = path_done & ~(lane_done > 0.5)

        cam_o, cam_d = spawn(next_sample, pid_n, pxf_n, pyf_n, s0_n)
        new_radiance = _vwhere(respawn, _vzero(zero), radiance)
        new_throughput = _vwhere(respawn, (one, one, one), new_tp)
        new_o = _vwhere(respawn, cam_o, cont_o)
        new_d = _vwhere(respawn, cam_d, wi_world)
        new_depth = jnp.where(respawn, U32(0), depth + U32(1))
        new_prev_pdf = jnp.where(respawn, 0.0, bs_pdf)
        new_prev_spec = jnp.where(respawn, 1.0, bs_spec)
        new_prev_point = _vwhere(respawn, cam_o, point)
        new_ignore = jnp.where(respawn, -1.0, prim_c)

        return (
            s_sum, s_sq, next_sample, lane_done, new_radiance, new_throughput,
            new_o, new_d, new_depth, new_prev_pdf, new_prev_spec,
            new_prev_point, new_ignore,
            slot_f, pid_n, pxf_n, pyf_n, s0_n,
        )

    state = jax.lax.while_loop(cond, body, state)
    s_sum, s_sq = state[0], state[1]
    for k in range(3):
        for j in range(K):
            outs[k][0, j] = s_sum[j][k].reshape(8, 128)
            outs[3 + k][0, j] = s_sq[j][k].reshape(8, 128)


def _wrap_mega(*refs, static):
    hier = static[19]
    has_tree = static[22]
    tex_on = static[26]
    n_in = 13 if hier else 21  # 2 scalar + 5 ray + (3 hier | 14 dense) tables
    if has_tree:
        n_in += 2  # treeT, tlT
    if tex_on:
        n_in += 1  # texT
    ins, outs = refs[:n_in], refs[n_in : n_in + 6]
    scratch = refs[n_in + 6 :] if hier else None
    _mega_kernel(*ins, outs=outs, scratch=scratch, static=static)


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------


def supported(scene) -> bool:
    """Static applicability check (shapes/flags only — safe at trace time)."""
    from ..scene.cameras import PERSPECTIVE

    soa = scene.prim_soa
    return (
        soa is not None
        and soa.padded <= MEGA_PRIM_LIMIT
        and _tree_ok(scene.lights.tree)
        and not scene.env_maps
        and scene.tex_atlas.shape[0] <= MEGA_TEX_LIMIT
        and scene.camera.kind == PERSPECTIVE
        and scene.lights.num_lights <= MEGA_LIGHT_LIMIT
        and scene.emissive_pack.shape[0] <= MEGA_LIGHT_LIMIT
    )


def unsupported_reason(scene) -> str | None:
    """Why `supported` is False (None when it is True) — surfaced in the
    render log/stats so a scene silently losing the fused fast path is
    diagnosable (VERDICT r3 weak #6)."""
    from ..scene.cameras import PERSPECTIVE

    soa = scene.prim_soa
    if soa is None or soa.padded > MEGA_PRIM_LIMIT:
        return f"prims > {MEGA_PRIM_LIMIT}"
    if not _tree_ok(scene.lights.tree):
        return "light tree deeper than 24"
    if scene.env_maps:
        return "environment map (importance sampling is wavefront-only)"
    if scene.tex_atlas.shape[0] > MEGA_TEX_LIMIT:
        return f"more than {MEGA_TEX_LIMIT} textures (one-hot fetch cost)"
    if scene.camera.kind != PERSPECTIVE:
        return "non-perspective camera"
    if (scene.lights.num_lights > MEGA_LIGHT_LIMIT
            or scene.emissive_pack.shape[0] > MEGA_LIGHT_LIMIT):
        return f"more than {MEGA_LIGHT_LIMIT} lights"
    return None


def _tree_ok(tree) -> bool:
    """Light-tree descent runs in-kernel (one-hot node fetches) as long as
    the leaf-path bitmask stays exact in an f32 table row."""
    return tree is None or tree.max_depth <= 24


def supported_hier(scene) -> bool:
    """Applicability of the large-scene (fat-chunk) megakernel: any scene
    with hierarchical tables and megakernel-compatible lights/camera.
    Instanced scenes stay on the XLA wavefront for now. Textured scenes
    are EXCLUDED: the hier kernel has no texture stage yet, and admitting
    them would silently render untextured instead of falling back to the
    wavefront (ADVICE r4 #1)."""
    from ..scene.cameras import PERSPECTIVE

    soa = scene.hier_soa
    return (
        soa is not None
        and not soa.instanced
        and scene.instances is None
        and _tree_ok(scene.lights.tree)
        and not scene.env_maps
        and scene.tex_atlas.shape[0] == 0
        and scene.camera.kind == PERSPECTIVE
        and scene.lights.num_lights <= MEGA_LIGHT_LIMIT
        and scene.emissive_pack.shape[0] <= MEGA_LIGHT_LIMIT
    )


def _build_fat_chunks(scene):
    """(C, FAT_ROWS, HCHUNK) fat chunk tensor: the hier SoA's 16 intersect
    rows + the SP_ROWS shading rows in sorted-slot order (padding slots
    contribute nothing: their intersect rows never hit, and attr rows are
    zero-filled)."""
    soa = scene.hier_soa
    slots = soa.num_chunks * HCHUNK
    p_orig = soa.num_prims
    order = soa.order  # slot/sorted -> storage prim (length p_orig here)

    def permpad_col(col, fill=0.0):
        col = jnp.asarray(col, F32)[order]
        return jnp.pad(col, (0, slots - p_orig), constant_values=fill)

    sp = scene.shade_pack
    lt = scene.lights
    sp_rows = [permpad_col(sp[:, i]) for i in list(range(12)) + [18, 19, 20]]
    sp_rows.append(permpad_col(lt.prim_light.astype(F32), -1.0))
    prim_power = jnp.where(
        lt.prim_light >= 0, lt.power[jnp.maximum(lt.prim_light, 0)], 0.0
    )
    sp_rows.append(permpad_col(prim_power))
    attr = jnp.stack(sp_rows, 0).reshape(SP_ROWS, soa.num_chunks, HCHUNK)
    attr = jnp.transpose(attr, (1, 0, 2))  # (C, SP_ROWS, HCHUNK)
    fat = jnp.concatenate([soa.prim_chunks, attr], axis=1)  # (C, 33, H)
    pad = FAT_ROWS - fat.shape[1]
    return jnp.pad(fat, ((0, 0), (0, pad), (0, 0)))


def _pad8(n: int) -> int:
    return -(-max(n, 1) // 8) * 8


def _build_tables(scene):
    """Pack the scene into the kernel's table layouts (traced; a handful of
    tiny gathers per compiled program)."""
    soa = scene.prim_soa
    p_orig = soa.num_prims
    p_pad = soa.padded
    order = soa.order

    def permpad_col(col, fill=0.0):
        col = jnp.asarray(col, F32)[order]
        return jnp.pad(col, (0, p_pad - p_orig), constant_values=fill)

    sp = scene.shade_pack
    lt = scene.lights
    tex_on = scene.tex_atlas.shape[0] > 0
    sp_rows = [permpad_col(sp[:, i]) for i in list(range(12)) + [18, 19, 20]]
    sp_rows.append(permpad_col(lt.prim_light.astype(F32), -1.0))
    prim_power = jnp.where(
        lt.prim_light >= 0, lt.power[jnp.maximum(lt.prim_light, 0)], 0.0
    )
    sp_rows.append(permpad_col(prim_power))
    if tex_on:
        # rows 17..22: uv0/uv1/uv2 (shade_pack cols 12:18) for in-kernel
        # barycentric texture coordinates — appended so the untextured
        # table keeps its height (the sp one-hot lookup cost is O(rows))
        sp_rows += [permpad_col(sp[:, i]) for i in range(12, 18)]
    spT = jnp.stack(sp_rows, 0)  # (SP_ROWS[+6], P)

    mp = scene.mat_pack
    m_pad = _pad8(mp.shape[0])
    mat_cols = [mp[:, 0:11], mp[:, 12:13]]
    if tex_on:
        # rows 12..15: albedo-texture id, normal-map id, normal intensity,
        # roughness-texture id (mat_pack cols 11, 13, 14, 15)
        mat_cols += [mp[:, 11:12], mp[:, 13:14], mp[:, 14:15], mp[:, 15:16]]
    matT = jnp.pad(
        jnp.concatenate(mat_cols, axis=1).T,
        ((0, 0), (0, m_pad - mp.shape[0])),
    )  # rows: albedo(3) params(4) extra(3) type one_sided [tex ntex nint rtex]

    if tex_on:
        # texel table for in-kernel bilinear fetches: channel-major rows
        # (row = c*R + x), texture-major cols (col = tex*R + y). Values
        # are bf16-representable f32 (quantized once at prep), so the 0/1
        # one-hot MXU fetch is EXACT at single-pass precision and matches
        # scene_ops._sample_atlas texel-for-texel.
        atlas = scene.tex_atlas[..., :3]  # (A, R, R, 3) [a, y, x, c]
        a_count, tex_res = atlas.shape[0], atlas.shape[1]
        # stored bf16: the values are bf16-representable (quantized at
        # prep), so this is lossless and halves the table's VMEM footprint
        texT = atlas.transpose(3, 2, 0, 1).reshape(
            3 * tex_res, a_count * tex_res
        ).astype(jnp.bfloat16)
    else:
        a_count = tex_res = 0
        texT = jnp.zeros((0, 0), F32)

    n_lights = lt.num_lights
    l_pad = _pad8(n_lights)
    kind = lt.kind.astype(F32)
    posdir = jnp.zeros((n_lights, 3), F32)
    inten = jnp.zeros((n_lights, 3), F32)
    idx = lt.index
    if lt.point_pos.shape[0]:
        sel = (lt.kind == LIGHT_POINT)[:, None]
        ci = jnp.clip(idx, 0, lt.point_pos.shape[0] - 1)
        posdir = jnp.where(sel, lt.point_pos[ci], posdir)
        inten = jnp.where(sel, lt.point_intensity[ci], inten)
    if lt.dir_dir.shape[0]:
        sel = (lt.kind == LIGHT_DIRECTIONAL)[:, None]
        ci = jnp.clip(idx, 0, lt.dir_dir.shape[0] - 1)
        posdir = jnp.where(sel, lt.dir_dir[ci], posdir)
        inten = jnp.where(sel, lt.dir_intensity[ci], inten)
    # infinite/finite split rows (scene_ops._infinite_split, same jnp ops
    # so the kernel's two-stage pick bit-matches the XLA wavefront)
    inf_mask = (lt.kind == LIGHT_DIRECTIONAL) | (lt.kind == LIGHT_AMBIENT)
    w_inf = jnp.where(inf_mask, lt.power, 0.0)
    sum_inf = jnp.maximum(jnp.sum(w_inf), 1e-20)
    cdf_inf = jnp.cumsum(w_inf) / sum_inf
    light_rows = jnp.stack(
        [kind, lt.cdf, lt.power, posdir[:, 0], posdir[:, 1], posdir[:, 2],
         inten[:, 0], inten[:, 1], inten[:, 2], idx.astype(F32),
         w_inf, cdf_inf, lt.record_tree.astype(F32)], 0
    )
    # pad cdfs with 2.0 so padded records are never picked
    pad_vals = (
        jnp.zeros((LT_ROWS, l_pad - n_lights), F32)
        .at[1].set(2.0).at[11].set(2.0).at[12].set(-1.0)
    )
    lightT = jnp.concatenate([light_rows, pad_vals], axis=1)

    # light-tree tables (Estevez-Kulla descent in-kernel)
    tree = lt.tree
    if tree is not None:
        t_pad = _pad8(tree.nodes.shape[0])
        treeT = jnp.pad(
            jnp.asarray(tree.nodes, F32).T,
            ((0, 0), (0, t_pad - tree.nodes.shape[0])),
        )
        n_f = lt.tree_records.shape[0]
        f_pad = _pad8(n_f)
        tlT = jnp.pad(
            jnp.stack(
                [lt.tree_records.astype(F32),
                 tree.light_path.astype(F32),
                 tree.light_depth.astype(F32)], 0,
            ),
            ((0, 0), (0, f_pad - n_f)),
        )
        tree_depth = int(tree.max_depth)
    else:
        treeT = tlT = None
        t_pad = f_pad = tree_depth = 0

    ep = scene.emissive_pack
    n_e = ep.shape[0]
    e_pad = _pad8(n_e)
    if n_e:
        if soa.padded > PRIM_BLOCK:  # reordered prim space (pallas_intersect)
            sprim = soa.inv_order[lt.emissive_prim].astype(F32)
        else:
            sprim = lt.emissive_prim.astype(F32)
        ep_rows = jnp.concatenate([ep[:, 0:17].T, sprim[None, :]], axis=0)
        epackT = jnp.pad(ep_rows, ((0, 0), (0, e_pad - n_e)))
    else:
        epackT = jnp.zeros((EP_ROWS, e_pad), F32).at[15].set(1.0)

    # camera + scalar row
    cam = scene.camera
    amb_records = lt.kind == LIGHT_AMBIENT
    total = jnp.sum(lt.power)
    amb_pmf = jnp.sum(jnp.where(amb_records, lt.power, 0.0)) / jnp.maximum(total, 1e-20)
    cam_row = jnp.zeros((C_LEN,), F32)
    cam_row = cam_row.at[C_POS : C_POS + 3].set(cam.position)
    cam_row = cam_row.at[C_ROT : C_ROT + 9].set(cam.rotation.reshape(-1))
    cam_row = cam_row.at[C_FL].set(cam.forward_length)
    cam_row = cam_row.at[C_LENS].set(cam.lens_radius)
    cam_row = cam_row.at[C_FOCAL].set(cam.focal_distance)
    cam_row = cam_row.at[C_AMB_ALL : C_AMB_ALL + 3].set(lt.ambient_all)
    cam_row = cam_row.at[C_AMB_CAM : C_AMB_CAM + 3].set(lt.ambient_camera)
    cam_row = cam_row.at[C_AMB_PMF].set(amb_pmf)
    cam_row = cam_row.at[C_TOTAL_POWER].set(jnp.maximum(total, 1e-20))
    cam_row = cam_row.at[C_P_INF].set(jnp.sum(w_inf) / jnp.maximum(total, 1e-20))
    cam_row = cam_row.at[C_SUM_INF].set(sum_inf)

    static = dict(
        n_lights=n_lights, l_pad=l_pad, m_pad=m_pad, e_pad=e_pad,
        sp_pad=p_pad,
        has_point=bool(lt.point_pos.shape[0]),
        has_dir=bool(lt.dir_dir.shape[0]),
        has_emissive=bool(n_e),
        has_amb=True,  # the ambient branch costs one uniform-sphere mapping
        has_tree=tree is not None, tree_depth=tree_depth,
        t_pad=t_pad, f_pad=f_pad,
        tex_on=tex_on, tex_res=tex_res, a_count=a_count,
        has_ntex=bool(tex_on and scene.materials.tex_flags[1]),
        has_rtex=bool(tex_on and scene.materials.tex_flags[2]),
    )
    return spT, matT, lightT, epackT, treeT, tlT, texT, cam_row, static


def sample_frame_mega(
    scene,
    pixel_id,
    pixel_xy,
    resolution,
    seed,
    sample_start,
    count: int,
    *,
    bounce_limit: int = 128,
    survivability: float = 2.5,
    hier: bool = False,
    k_slots: int | None = None,
):
    """Drop-in replacement for evaluation/wavefront.sample_frame_wavefront
    (same contract: per-lane (sum, sum_sq) of `count` samples).

    `k_slots`: pixels served per lane back to back (None = auto). Serving
    K pixels per lane averages the per-block regeneration tail (the wait
    for the slowest lane) over K path-length sums — at spp=64 the tail
    was ~20-30%% of block iterations. Per-pixel streams and sums are
    bitwise unchanged (identity switches slots, draws key on pixel)."""
    n = pixel_id.shape[0]
    if k_slots is None:
        # r4 sweep on the 80-sphere bench (960x540 @ 64spp): K=4 -> 37.6,
        # K=8 -> 40.3, K=16 -> 42.4, K=32 -> 43.3 Mspps (plateau; K=64
        # flat), from 34.1 at K=1. Small waves keep K=1.
        if hier or n < 64 * RAY_BLOCK:
            k_slots = 1
        else:
            k_slots = max(1, min(32, n // (RAY_BLOCK * 4)))
    K = k_slots
    g = -(-n // (RAY_BLOCK * K))
    pad = g * RAY_BLOCK * K - n

    def padto(x, fill=0):
        x = jnp.asarray(x)
        x = jnp.broadcast_to(x, (n,))
        # slot-major: slot j covers pixels [j*g*1024, (j+1)*g*1024) so the
        # padding tail occupies only the trailing slots of the last blocks
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(
            K, g, 8, 128
        ).transpose(1, 0, 2, 3)

    pid = padto(pixel_id.astype(U32))
    pxf = padto(pixel_xy[:, 0].astype(F32))
    pyf = padto(pixel_xy[:, 1].astype(F32))
    s0 = padto(jnp.asarray(sample_start, U32))
    valid = padto(jnp.ones((n,), F32), 0.0)

    (spT, matT, lightT, epackT, treeT, tlT, texT, cam_row,
     tstatic) = _build_tables(scene)
    seed_row = jnp.asarray(seed, U32).reshape(1)
    width, height = resolution

    if hier:
        hsoa = scene.hier_soa
        n_chunks = chunk_w = 0
        has_tri = hsoa.num_tris > 0
        has_sph = hsoa.num_prims > hsoa.num_tris
        hier_static = (True, hsoa.root_code, HCHUNK // 128)
        stack_size = hsoa.stack_size
    else:
        soa = scene.prim_soa
        p_pad = soa.padded
        n_chunks = max(1, p_pad // PRIM_BLOCK) if p_pad > PRIM_BLOCK else 1
        chunk_w = p_pad // n_chunks
        has_tri = soa.num_tris > 0
        has_sph = soa.num_prims > soa.num_tris
        hier_static = (False, 0, 0)
        stack_size = 0

    static = (
        count, bounce_limit, float(survivability), int(width), int(height),
        tuple(scene.materials.present), n_chunks, chunk_w,
        has_tri, has_sph,
        tstatic["n_lights"], tstatic["l_pad"], tstatic["m_pad"], tstatic["e_pad"],
        tstatic["has_point"], tstatic["has_dir"], tstatic["has_amb"],
        tstatic["has_emissive"], tstatic["sp_pad"],
    ) + hier_static + (
        tstatic["has_tree"], tstatic["tree_depth"],
        tstatic["t_pad"], tstatic["f_pad"],
        # texture statics (appended so earlier positional reads stay put)
        tstatic["tex_on"] and not hier, tstatic["tex_res"],
        tstatic["a_count"], tstatic["has_ntex"], tstatic["has_rtex"],
        K,
    )

    ray_spec = pl.BlockSpec(
        (1, K, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.SMEM)

    if hier:
        fat = _build_fat_chunks(scene)
        bounds, codes = scene.hier_soa.bounds, scene.hier_soa.codes
        in_specs = (
            [smem(cam_row), smem(seed_row)]
            + [ray_spec] * 5
            + [smem(bounds), smem(codes), pl.BlockSpec(memory_space=pl.ANY)]
            + [full(matT), full(lightT), full(epackT)]
        )
        inputs = (cam_row, seed_row, pid, pxf, pyf, s0, valid,
                  bounds, codes, fat, matT, lightT, epackT)
        if tstatic["has_tree"]:
            in_specs = in_specs + [full(treeT), full(tlT)]
            inputs = inputs + (treeT, tlT)
        scratch_shapes = [
            pltpu.VMEM((2, FAT_ROWS, HCHUNK), F32),  # DMA double buffer
            pltpu.VMEM((WS_ROWS, RAY_BLOCK), F32),  # walk state
            pltpu.SMEM((stack_size,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        prim_rows = tuple(scene.prim_soa[:10])
        in_specs = (
            [smem(cam_row), smem(seed_row)]
            + [ray_spec] * 5
            + [full(r) for r in prim_rows]
            + [full(spT), full(matT), full(lightT), full(epackT)]
        )
        inputs = (cam_row, seed_row, pid, pxf, pyf, s0, valid,
                  *prim_rows, spT, matT, lightT, epackT)
        if tstatic["has_tree"]:
            in_specs = in_specs + [full(treeT), full(tlT)]
            inputs = inputs + (treeT, tlT)
        if tstatic["tex_on"]:
            in_specs = in_specs + [full(texT)]
            inputs = inputs + (texT,)
        scratch_shapes = []

    outs = pl.pallas_call(
        functools.partial(_wrap_mega, static=static),
        grid=(g,),
        in_specs=in_specs,
        out_specs=[ray_spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((g, K, 8, 128), F32)] * 6,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # textured scenes: the texel table + the sampler's (R, BR)
            # weight planes exceed the default 16M scoped budget
            vmem_limit_bytes=(100 * 1024 * 1024) if tstatic["tex_on"] else None,
        ),
        interpret=_interpret(),
    )(*inputs)

    flat = [o.transpose(1, 0, 2, 3).reshape(-1)[:n] for o in outs]
    s_sum = jnp.stack(flat[0:3], axis=-1)
    s_sq = jnp.stack(flat[3:6], axis=-1)
    return s_sum, s_sq
