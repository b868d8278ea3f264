"""Host-side feasibility analysis for the r5 'wave' traversal candidate:
rays presorted by first eligible chunk, wave j intersects each pending
ray's j-th eligible chunk IN RAY ORDER (no per-round pair sort / record
gather / unpack). Viability hinges on chunk-run locality inside 128-lane
rows at wave j — every extra segment per row adds a full chunk DMA and a
full 256-prim intersection pass for that row.

This measures, from the real 1M-tri scene geometry on the host:
  - segments/row (mean, p90) per wave, rays sorted by first chunk
  - the same when pending rays are RE-sorted by their j-th chunk
Run on CPU: python benchmarks/wave_locality.py [n_log2=16]
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trace_throughput import make_mesh
from echorenderer_tpu.ops import pallas_hier as ph
from echorenderer_tpu.aggregation.bvh import build_bvh, geometry_bounds

ROW = 128
W = 12  # eligible-list cap examined


def seg_stats(chunks_row_major, pend):
    """chunks (n,) int chunk id per pending lane (-1 = dead); count
    run-segments per 128-lane row over pending lanes only (dead lanes
    inherit the previous id — they cost nothing in the row kernel)."""
    ids = chunks_row_major.copy()
    # dead lanes: carry previous live id forward so they don't split runs
    live = pend & (ids >= 0)
    idx = np.where(live, np.arange(ids.size), -1)
    np.maximum.accumulate(idx, out=idx)
    ids = np.where(idx >= 0, ids[np.maximum(idx, 0)], -1)
    rows = ids.reshape(-1, ROW)
    segs = 1 + (rows[:, 1:] != rows[:, :-1]).sum(axis=1)
    # rows with zero live lanes cost nothing
    any_live = live.reshape(-1, ROW).any(axis=1)
    segs = segs[any_live]
    return segs.mean() if segs.size else 0.0, (
        np.percentile(segs, 90) if segs.size else 0.0), any_live.mean()


def main():
    n = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 16)
    rs = np.random.RandomState(1)
    geom, t = make_mesh(23, 31)
    bmin, bmax = geometry_bounds(
        {k: np.asarray(v) for k, v in geom._asdict().items()})
    bvh = build_bvh(bmin, bmax)
    hier = ph.build_hier_soa(geom, np.asarray(bvh.prim_order))
    cb = np.asarray(hier.chunk_bounds)  # (C, 6) lo|hi
    c = cb.shape[0]
    print(f"tris={t} chunks={c} rays={n}", flush=True)

    ext = 23 * 2.5
    o = np.stack([rs.uniform(0, ext, n), rs.uniform(0, 2.0, n),
                  rs.uniform(0, ext, n)], -1).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)

    # per-ray eligible chunks (slab pass), sorted by entry, capped at W
    order = np.full((n, W), -1, np.int32)
    entry0 = np.full((n,), np.inf, np.float32)
    B = 4096
    for s in range(0, n, B):
        sl = slice(s, min(s + B, n))
        t0 = (cb[None, :, 0:3] - o[sl, None]) * inv[sl, None]  # (b, C, 3)
        t1 = (cb[None, :, 3:6] - o[sl, None]) * inv[sl, None]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        ok = (tn <= tf) & (tf > 0)
        tn = np.where(ok, np.maximum(tn, 0.0), np.inf)
        idx = np.argsort(tn, axis=1)[:, :W]
        tn_s = np.take_along_axis(tn, idx, axis=1)
        order[sl] = np.where(np.isfinite(tn_s), idx, -1)
        entry0[sl] = tn_s[:, 0]

    n_elig = (order >= 0).sum(axis=1)
    print(f"eligible/ray: mean {n_elig.mean():.2f} p90 "
          f"{np.percentile(n_elig, 90):.0f}", flush=True)

    # presort rays by first eligible chunk (misses last)
    first = np.where(order[:, 0] >= 0, order[:, 0], c)
    perm = np.argsort(first, kind="stable")
    osort = order[perm]

    # assume a ray resolves after visiting min(eligible, 4) chunks (the
    # measured mean needed is 3.5) — locality, not termination, is the
    # question here
    resolve_after = np.minimum(n_elig[perm], 4)

    print("wave | pend%% | segs/row (presorted) | segs/row (re-sorted)",
          flush=True)
    for j in range(6):
        pend = (resolve_after > j) & (osort[:, min(j, W - 1)] >= 0)
        wave = np.where(pend, osort[:, min(j, W - 1)], -1)
        m0, p90, occ = seg_stats(wave, pend)
        # re-sorted: pending rays compacted + ordered by their j-th chunk
        wsel = wave[pend]
        ws = np.sort(wsel)
        pad = -(-ws.size // ROW) * ROW - ws.size
        ws = np.concatenate([ws, np.full(pad, ws[-1] if ws.size else 0,
                                         np.int32)])
        m1, p91, _ = seg_stats(ws, np.ones(ws.size, bool))
        print(f"  {j}  | {pend.mean()*100:5.1f} | {m0:6.2f} (p90 {p90:4.0f})"
              f" occ {occ*100:4.0f}%% | {m1:6.2f} (p90 {p91:4.0f})",
              flush=True)


main()
