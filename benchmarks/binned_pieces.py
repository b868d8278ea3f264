"""Time the binned-traversal round pieces in isolation at production shapes
(1M-tri scene, 131k rays) so optimization targets the real cost. Run on TPU."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from trace_throughput import make_mesh
from echorenderer_tpu.ops import pallas_hier as ph
from echorenderer_tpu.ops import binned_trace as bt
from echorenderer_tpu.aggregation.bvh import build_bvh, geometry_bounds


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def timeit(name, fn, reps=5):
    out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out[0] if isinstance(out, tuple) else out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:44s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    n = 2 ** 17
    rs = np.random.RandomState(1)
    geom, t = make_mesh(23, 31)
    bmin, bmax = geometry_bounds({k2: np.asarray(v) for k2, v in geom._asdict().items()})
    bvh = build_bvh(bmin, bmax)
    hier = ph.build_hier_soa(geom, np.asarray(bvh.prim_order))
    c = hier.num_chunks
    s_count = -(-c // bt.SUP)
    print(f"tris={t} chunks={c} supers={s_count} rays={n}", flush=True)

    ext = 23 * 2.5
    o = jnp.asarray(np.stack([
        rs.uniform(0, ext, n), rs.uniform(0, 2.0, n),
        rs.uniform(0, ext, n)], -1).astype(np.float32))
    dd = rs.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    ign = jnp.full((n,), -1.0)
    best_t = jnp.full((n,), bt._INF)

    cb = hier.chunk_bounds
    c_pad = s_count * bt.SUP
    cb_box = jnp.concatenate([
        cb,
        jnp.tile(jnp.asarray([[bt._INF] * 3 + [-bt._INF] * 3], jnp.float32),
                 (c_pad - c, 1)),
    ], axis=0)
    sup_cb = jnp.concatenate([
        cb_box[:, 0:3].reshape(s_count, bt.SUP, 3).min(1),
        cb_box[:, 3:6].reshape(s_count, bt.SUP, 3).max(1),
    ], axis=1)

    # Z: null program — the per-dispatch floor through the tunnel; every
    # other row's true device cost is (row - Z)
    znull = jax.jit(lambda: o[:8, 0] + 1.0)
    timeit("Z null program (dispatch floor)", znull)

    # A: super-level slab test (N, S)
    slab = jax.jit(lambda: bt._slab_all(o, d, sup_cb, best_t))
    timeit("A _slab_all (N,S)", slab)

    # B0: single-operand row sort of pre-encoded keys (the actual setup
    # sort shape: sup_ord)
    lb0 = bt._slab_all(o, d, sup_cb, best_t)
    keys0 = jax.lax.bitcast_convert_type(jnp.maximum(lb0, 0.0), jnp.int32)

    def rank1():
        return jax.lax.sort(keys0, dimension=1)
    timeit("B0 rank supers row-sort (N,S) 1-op", jax.jit(rank1))

    # B: rank supers — (N, S) 2-op row sort
    lb = bt._slab_all(o, d, sup_cb, best_t)
    iota_rows = jnp.broadcast_to(
        jnp.arange(s_count, dtype=jnp.int32)[None], (n, s_count))

    def rank():
        kv, ki = jax.lax.sort((lb, iota_rows), num_keys=1, dimension=1)
        return kv
    timeit("B rank supers row-sort (N,S) 2-op", jax.jit(rank))

    # C: one-hot chunk-bounds fetch matmul (N, KSUP*S) @ (KSUP*S, 6*KSUP*SUP)
    ksup, sup = bt.KSUP, bt.SUP
    cb_look = jnp.concatenate(
        [cb, jnp.full((s_count * sup - c, 6), bt._INF)], 0)
    eye_k = jnp.eye(ksup, dtype=jnp.float32)
    t_all = jnp.concatenate([
        jnp.kron(eye_k, cb_look[:, comp].reshape(s_count, sup))
        for comp in range(6)], axis=1)
    sup_sel = jnp.asarray(rs.randint(0, s_count, (n, ksup)), jnp.int32)
    iota_ks = jnp.arange(ksup * s_count, dtype=jnp.int32)

    def onehot():
        targ = sup_sel + s_count * jnp.arange(ksup, dtype=jnp.int32)[None]
        oh = jnp.zeros((n, ksup * s_count), jnp.float32)
        for j in range(ksup):
            oh = oh + (iota_ks[None] == targ[:, j:j+1]).astype(jnp.float32)
        return jnp.dot(oh, t_all, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    timeit("C one-hot bounds fetch (matmul)", jax.jit(onehot))

    # C-bf16: the production fetch since the conservative-bf16 table —
    # same gather, plain bf16 MXU matmul
    t_all_bf = t_all.astype(jnp.bfloat16)

    def onehot_bf():
        targ = sup_sel + s_count * jnp.arange(ksup, dtype=jnp.int32)[None]
        oh = jnp.zeros((n, ksup * s_count), jnp.bfloat16)
        for j in range(ksup):
            oh = oh + (iota_ks[None] == targ[:, j:j+1]).astype(jnp.bfloat16)
        return jnp.dot(oh, t_all_bf, preferred_element_type=jnp.float32)
    timeit("C-bf16 one-hot bounds fetch", jax.jit(onehot_bf))

    # C2: chunk slab + eligibility + k-sort at (N, KSUP*SUP)
    g = onehot()
    glob = jnp.asarray(rs.randint(0, c, (n, ksup * sup)), jnp.int32)

    def chunkrank():
        tn = jnp.abs(g[:, :ksup*sup]) * 0.5  # stand-in flops
        ts, gs = jax.lax.sort((tn, glob), num_keys=2, dimension=1)
        return ts
    timeit("C2 chunk 2-key row sort (N, 64)", jax.jit(chunkrank))

    # D: pack + kernel at full width, k=2
    k = 2
    m_pad = -(-(n * k) // 1024) * 1024
    sel_c = jnp.asarray(
        np.sort(rs.randint(0, c, (k, n)).astype(np.int32), axis=0))

    def pack():
        return bt._pack_and_intersect(
            sel_c, o, d, best_t, ign, hier.prim_chunks, c,
            hier.num_tris > 0, hier.num_prims > hier.num_tris, m_pad)
    timeit("D pack+kernel+unpack full (k=2)", jax.jit(pack))

    # D2: the pack/unpack sorts alone (no kernel): 10-operand sort of m_pad
    fields = tuple(jnp.tile(o[:, i % 3], (k,)) for i in range(8))
    key = jnp.concatenate([sel_c.reshape(-1),
                           jnp.zeros((m_pad - n * k,), jnp.int32)])
    fieldsp = tuple(jnp.concatenate([f, jnp.zeros((m_pad - n * k,))])
                    for f in fields)
    q = jnp.arange(m_pad, dtype=jnp.int32)

    def packsort():
        srt = jax.lax.sort((key,) + fieldsp + (q,), num_keys=1)
        return srt[0]
    timeit("D2 pack sort alone (10-op, m_pad)", jax.jit(packsort))

    def unpacksort():
        srt = jax.lax.sort((q, fieldsp[0], fieldsp[1], fieldsp[2], fieldsp[3]),
                           num_keys=1)
        return srt[1]
    timeit("D3 unpack sort alone (5-op, m_pad)", jax.jit(unpacksort))

    # E: compact-width versions (nc2 = 4096, ks = 8)
    nc2, ks = 4096, 8
    m_pad_c = -(-(nc2 * ks) // 1024) * 1024
    o_s, d_s = o[:nc2], d[:nc2]
    best_s, ign_s = best_t[:nc2], ign[:nc2]
    sel_s = jnp.asarray(
        np.sort(rs.randint(0, c, (ks, nc2)).astype(np.int32), axis=0))

    def pack_c():
        return bt._pack_and_intersect(
            sel_s, o_s, d_s, best_s, ign_s, hier.prim_chunks, c,
            hier.num_tris > 0, hier.num_prims > hier.num_tris, m_pad_c)
    timeit("E pack+kernel compact (4k, ks=8)", jax.jit(pack_c))

    lb_s = lb[:nc2]
    iota_s = iota_rows[:nc2]

    def rank_c():
        kv, ki = jax.lax.sort((lb_s, iota_s), num_keys=1, dimension=1)
        return kv
    timeit("E2 rank supers compact (4k, S)", jax.jit(rank_c))

    sup_sel_s = sup_sel[:nc2]

    def onehot_c():
        targ = sup_sel_s + s_count * jnp.arange(ksup, dtype=jnp.int32)[None]
        oh = jnp.zeros((nc2, ksup * s_count), jnp.float32)
        for j in range(ksup):
            oh = oh + (iota_ks[None] == targ[:, j:j+1]).astype(jnp.float32)
        return jnp.dot(oh, t_all, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    timeit("E3 one-hot fetch compact (4k)", jax.jit(onehot_c))


main()
