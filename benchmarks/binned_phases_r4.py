"""Round-4 phase profile of binned traversal at PRODUCTION scale
(1M rays x 1M tris): setup / full rounds / tail marginal costs, live-pair
counts per round, and knob sensitivity. This is the data every round-4
perf decision must trace back to (VERDICT r3 #1-2). Run on TPU:
`python benchmarks/binned_phases_r4.py [n_log2=20]`."""
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


def timeit(name, fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    n = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
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
    ign = jnp.full((n,), -1, jnp.int32)
    ign_f = ign.astype(jnp.float32)
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
    sbits = max(1, (s_count - 1).bit_length())

    # ---- phase 1: setup
    setup = jax.jit(lambda: bt._setup_rank(o, d, sup_cb, best_t, sbits))
    timeit("setup Pallas slab+rank (n, S)", setup)

    # ---- phase 2: pack+kernel+unpack at full width, k=4 (round-1 shape:
    # every pair live, nearest chunks => realistic segment structure)
    sup_tn = jax.jit(lambda: bt._slab_all(o, d, sup_cb, best_t))()
    # realistic round-1 pair set: 4 chunks of each ray's nearest eligible
    # super (same spatial clustering as real pops; an (n, C) top-k would
    # need 16 GB at this scale)
    k = 4
    s_star = jnp.argmin(sup_tn, axis=1).astype(jnp.int32)
    has = jnp.min(sup_tn, axis=1) < bt._INF
    sel_c = jnp.where(
        has[None, :],
        s_star[None, :] * bt.SUP + jnp.arange(k, dtype=jnp.int32)[:, None],
        -1,
    )  # (k, n)
    sel_c = jnp.minimum(sel_c, c - 1)
    sel_c = jax.device_put(np.asarray(jax.device_get(sel_c)))
    m_pad = -(-(n * k) // 1024) * 1024
    live_frac = float(jnp.mean((sel_c >= 0) * 1.0))
    print(f"  round-1 live pair fraction: {live_frac:.3f}", flush=True)

    pack = jax.jit(lambda: bt._pack_and_intersect(
        sel_c, o, d, best_t, ign_f, hier.prim_chunks, c,
        hier.num_tris > 0, hier.num_prims > hier.num_tris, m_pad))
    timeit(f"round pack+kernel+unpack full (k={k}, all live)", pack)

    # the two sorts alone at this m_pad
    key = jnp.where(sel_c.reshape(-1) >= 0, sel_c.reshape(-1), c)
    key = jnp.concatenate([key, jnp.full((m_pad - n * k,), c, jnp.int32)])
    q = jnp.arange(m_pad, dtype=jnp.int32)
    timeit("  pack sort alone (2-op, m_pad)",
           jax.jit(lambda: jax.lax.sort((key, q), num_keys=1)[1]))
    rec = jnp.stack([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                     best_t, ign_f], axis=1)
    timeit("  row gather alone (m_pad, 8)",
           jax.jit(lambda: jnp.take(rec, q % n, axis=0)))

    # ---- phase 3: e2e knob sensitivity
    def e2e(**kw):
        return bt._trace_binned_impl(
            o, d, jnp.broadcast_to(jnp.asarray(jnp.inf, jnp.float32), (n,)),
            ign, cb, hier.prim_chunks,
            hier.num_tris > 0, hier.num_prims > hier.num_tris,
            4, 32, False, 4096, **kw)

    base = timeit("e2e default (fr=2, cf=16)", lambda: e2e())
    for fr in (1, 3):
        timeit(f"e2e full_rounds={fr}", lambda fr=fr: e2e(full_rounds=fr))
    for cf in (8, 32, 64):
        timeit(f"e2e compact_fraction={cf}",
               lambda cf=cf: e2e(compact_fraction=cf))
    timeit("e2e k_straggler=16", lambda: bt._trace_binned_impl(
        o, d, jnp.broadcast_to(jnp.asarray(jnp.inf, jnp.float32), (n,)),
        ign, cb, hier.prim_chunks,
        hier.num_tris > 0, hier.num_prims > hier.num_tris,
        4, 16, False, 4096))

    # ---- pending counts after r full rounds (sizes the tail)
    for fr in (1, 2, 3, 4):
        # no-tail variant would loop forever; instead count via workload:
        pass
    # approximate: rays whose 4*fr nearest eligible chunks do not contain
    # their hit — use needed-count distribution instead (binned_workload).


main()
