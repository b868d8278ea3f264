"""Micro-benchmark: MXU-Plücker keyed triangle intersection vs the
all-VPU Möller-Trumbore `_chunk_hits` epilogue, at the binned row
kernel's exact shapes (128-prim sub-blocks x 128-lane rows).

The binned row kernel spends ~57 VPU ops per (prim, ray) element on
Möller-Trumbore; the Plücker form precomputes per-triangle edge moments
so the three edge-sign volumes w_i = d.(PxQ) + m.(Q-P) (m = o x d), the
plane denominator n.d and numerator n.v0 - n.o are ONE shared-K matmul
against per-ray [d, m, o, 1] columns, leaving a ~20-op validity+key
epilogue on the VPU. This script measures the candidate matmul shapes
(lhs-transposed dim0 contraction vs plain (P, K) x (K, N)) and checks
hit agreement vs _chunk_hits on random geometry.

Run on TPU: python benchmarks/plucker_micro.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from echorenderer_tpu.ops.pallas_intersect import _chunk_hits, _EPS

_INF = 3.4e38
_INT_INF = 2**31 - 1
H = 256  # prims per chunk
_PBITS = 8


def build_plk(prims, center=None):
    """prims: (10, H) rows [v0(3), e1(3), e2(3), sph] -> (16, 5H) f32 lhs
    table: column groups [w0(H) w1(H) w2(H) den(H) num(H)], sublane slots
    [d(0:3), m(3:6), o(6:9), one(9), pad(10:16)]. `center` (3,) shifts the
    working frame to chunk-local coordinates: products then scale with the
    chunk diameter instead of the scene, cutting the cancellation error in
    the plane-form num/den t (rays must be shifted by the same center)."""
    v0 = prims[0:3]
    if center is not None:
        v0 = v0 - center[:, None]
    e1 = prims[3:6]
    e2 = prims[6:9]

    def cross(a, b):
        return jnp.stack([
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ])

    c0 = cross(v0, e1)                    # A x B
    c1 = cross(v0, e2) - cross(v0, e1) + cross(e1, e2)  # B x C
    c2 = -cross(v0, e2)                   # C x A
    n = cross(e1, e2)
    nv0 = jnp.sum(n * v0, axis=0)
    z = jnp.zeros_like(v0)
    z1 = jnp.zeros_like(nv0)
    o1 = jnp.ones_like(nv0)

    def col16(dm, mm, om, onev):
        return jnp.concatenate([
            dm, mm, om, onev[None], jnp.zeros((6, dm.shape[1]), dm.dtype)
        ], axis=0)  # (16, H)

    w0 = col16(c0, e1, z, z1)
    w1 = col16(c1, e2 - e1, z, z1)
    w2 = col16(c2, -e2, z, z1)
    den = col16(n, z, z, z1)
    num = col16(z, z, -n, nv0)
    return jnp.concatenate([w0, w1, w2, den, num], axis=1)  # (16, 5H)


def kern_mt(px, *args):
    """Baseline: current keyed MT epilogue at (1,8,128) ray rows."""
    ox, oy, oz, dx, dy, dz, tm, ig, out = args
    for s8 in range(8):
        row = lambda a: a[0, s8:s8+1, :]
        best = jnp.full((1, 128), _INT_INF, jnp.int32)
        for sub in range(H // 128):
            blk = [px[q:q+1, sub*128:(sub+1)*128] for q in range(10)]
            t, _, _, _ = _chunk_hits(
                blk, float(sub * 128), row(ox), row(oy), row(oz),
                row(dx), row(dy), row(dz), row(ig), True, False)
            valid = (t < row(tm)) & (t < _INF)
            tb = jax.lax.bitcast_convert_type(t, jnp.int32)
            local = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + sub * 128
            key = jnp.where(valid, (tb & jnp.int32(-(1 << _PBITS))) | local,
                            _INT_INF)
            best = jnp.minimum(best, jnp.min(key, axis=0, keepdims=True))
        out[0, s8:s8+1, :] = best


def _plk_keyed(plk, rox, roy, roz, rdx, rdy, rdz, rtm, rig, *, prec):
    """(16, 5H) lhs x per-ray rhs -> packed keys (1, 128)."""
    mx = roy * rdz - roz * rdy
    my = roz * rdx - rox * rdz
    mz = rox * rdy - roy * rdx
    one = jnp.ones_like(rox)
    zz = jnp.zeros_like(rox)
    # edge dot: K=8 rows [d, m, pad2]; plane dot: K=8 rows [d, o, one, pad]
    rhsA = jnp.concatenate([rdx, rdy, rdz, mx, my, mz, zz, zz], axis=0)
    rhsB = jnp.concatenate([rdx, rdy, rdz, rox, roy, roz, one, zz], axis=0)
    # lhs slices: edges use sublanes 0:6 -> rows [d(3), m(3)] pad to 8;
    # den uses [n in d slots], num uses [o slots, one slot] -> remap rows
    lhsA = jnp.concatenate([plk[0:8, 0:3*H]], axis=1)  # (8, 3H)
    lhsB = jnp.concatenate([
        plk[0:3, 3*H:4*H],            # den: n rides d slots 0:3
        jnp.zeros((5, H), plk.dtype),
    ], axis=0)
    lhsC = jnp.concatenate([
        jnp.zeros((3, H), plk.dtype),
        plk[6:9, 4*H:5*H],            # num: -n rides o slots -> rows 3:6
        plk[9:10, 4*H:5*H],           # nv0 rides the one slot -> row 6
        jnp.zeros((1, H), plk.dtype),
    ], axis=0)
    lhsBC = jnp.concatenate([lhsB, lhsC], axis=1)  # (8, 2H)
    dn = (((0,), (0,)), ((), ()))
    wA = jax.lax.dot_general(lhsA, rhsA, dn, preferred_element_type=jnp.float32,
                             precision=prec)  # (3H, 128)
    wBC = jax.lax.dot_general(lhsBC, rhsB, dn, preferred_element_type=jnp.float32,
                              precision=prec)  # (2H, 128)
    w0, w1, w2 = wA[0:H], wA[H:2*H], wA[2*H:3*H]
    den, num = wBC[0:H], wBC[H:2*H]
    inside = (jnp.minimum(jnp.minimum(w0, w1), w2) >= 0.0) | (
        jnp.maximum(jnp.maximum(w0, w1), w2) <= 0.0)
    t = num / den
    pid = jax.lax.broadcasted_iota(jnp.int32, (H, 128), 0)
    valid = inside & (t > _EPS) & (t < rtm) & (
        pid.astype(jnp.float32) != rig)
    tb = jax.lax.bitcast_convert_type(t, jnp.int32)
    key = jnp.where(valid, (tb & jnp.int32(-(1 << _PBITS))) | pid, _INT_INF)
    return jnp.min(key, axis=0, keepdims=True)


def make_kern_plk(prec):
    def kern(plk, *args):
        ox, oy, oz, dx, dy, dz, tm, ig, out = args
        for s8 in range(8):
            row = lambda a: a[0, s8:s8+1, :]
            out[0, s8:s8+1, :] = _plk_keyed(
                plk[:], row(ox), row(oy), row(oz), row(dx), row(dy),
                row(dz), row(tm), row(ig), prec=prec)
    return kern


def run(kern, tbl, cols, g, interpret=False):
    ray_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tbl_spec = pl.BlockSpec(tbl.shape, lambda i: tuple(0 for _ in tbl.shape),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[tbl_spec] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((g, 8, 128), jnp.int32),
        interpret=interpret,
    )(tbl, *cols)


def main():
    rs = np.random.RandomState(7)
    n = 2 ** int(os.environ.get("PLK_N_LOG2", "20"))
    g = n // 1024
    # random triangle soup in [0, 4)^3, sizes ~0.1
    v0 = rs.uniform(0, 4, (3, H)).astype(np.float32)
    e1 = rs.normal(0, 0.25, (3, H)).astype(np.float32)
    e2 = rs.normal(0, 0.25, (3, H)).astype(np.float32)
    prims = np.concatenate([v0, e1, e2, np.zeros((1, H), np.float32)], 0)
    prims_j = jnp.asarray(prims)
    center = jnp.mean(prims_j[0:3], axis=1)

    o = rs.uniform(0, 4, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    shape3 = (g, 8, 128)
    cols = tuple(jnp.asarray(o[:, a]).reshape(shape3) for a in range(3)) + \
        tuple(jnp.asarray(d[:, a]).reshape(shape3) for a in range(3)) + (
        jnp.full(shape3, _INF, jnp.float32),
        jnp.full(shape3, -1.0, jnp.float32),
    )
    cols_c = tuple(
        cols[a] - center[a] for a in range(3)) + cols[3:]  # chunk-local o

    interp = jax.default_backend() != 'tpu'
    k_mt = run(kern_mt, prims_j, cols, g, interp)
    hi = jax.lax.Precision.HIGHEST
    mt = np.asarray(k_mt).ravel()

    for label, plk_t, cc in [
        ("scene-frame", build_plk(prims_j), cols),
        ("chunk-local", build_plk(prims_j, center), cols_c),
    ]:
        k_hi = run(make_kern_plk(hi), plk_t, cc, g, interp)
        ph = np.asarray(k_hi).ravel()
        agree = (mt == ph).mean()
        both_hit = (mt != _INT_INF) & (ph != _INT_INF)
        t_mt = np.where(both_hit, (mt & ~0xFF).view(np.float32), 0)
        t_ph = np.where(both_hit, (ph & ~0xFF).view(np.float32), 0)
        prim_flip = (both_hit & ((mt & 0xFF) != (ph & 0xFF))).mean()
        onlyone = ((mt != _INT_INF) != (ph != _INT_INF)).mean()
        rel = np.abs(t_mt - t_ph) / np.maximum(np.abs(t_mt), 1e-6)
        print(f"{label}: key agree {agree:.7f}  prim flips {prim_flip:.2e}"
              f"  hit/miss flips {onlyone:.2e}  t rel max {rel.max():.3e}")
    plk = build_plk(prims_j, center)
    cols = cols_c

    if interp:
        print("(CPU interpret mode: numerics only)")
        return

    def bench(name, fn):
        fn().block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            r = fn()
        float(jnp.sum(r.ravel()[:8]))
        dt = (time.perf_counter() - t0) / 5
        pairs = n  # one (ray, chunk) pair per lane
        print(f"  {name:28s} {dt*1e3:7.2f} ms  {dt/pairs*1e9:6.2f} ns/pair")

    bench("MT keyed (current)", lambda: run(kern_mt, prims_j, cols, g))
    bench("Plücker HIGHEST", lambda: run(make_kern_plk(hi), plk, cols, g))
    bench("Plücker DEFAULT", lambda: run(make_kern_plk(None), plk, cols, g))


main()
