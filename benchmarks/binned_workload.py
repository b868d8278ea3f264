"""Fundamental work metric for binned traversal on the 1M-tri scene:
per-ray counts of (a) chunks whose slab test passes at all, (b) chunks
whose entry lies before the ray's true closest hit (the irreducible
visit set under perfect near-to-far ordering). Prints the distribution —
this bounds any binned schedule's round count and pair volume. Run on TPU.
"""
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


def main():
    n = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 17)
    rs = np.random.RandomState(1)
    geom, t = make_mesh(23, 31)
    bmin, bmax = geometry_bounds({k: np.asarray(v) for k, v in geom._asdict().items()})
    bvh = build_bvh(bmin, bmax)
    hier = ph.build_hier_soa(geom, np.asarray(bvh.prim_order))
    c = hier.num_chunks
    print(f"tris={t} chunks={c} rays={n}", flush=True)

    ext = 23 * 2.5
    o = jnp.asarray(np.stack([
        rs.uniform(0, ext, n), rs.uniform(0, 2.0, n),
        rs.uniform(0, ext, n)], -1).astype(np.float32))
    dd = rs.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    ig = jnp.full((n,), -1, jnp.int32)

    hit = bt.trace_binned(geom, hier, o, d, jnp.inf, ig)
    t_hit = jnp.where(hit.prim >= 0, hit.t, bt._INF)
    t_hit.block_until_ready()

    cb = hier.chunk_bounds  # (C, 6)

    # pad chunks to multiple of 4 for the scan reshape; pad boxes at +INF
    # fail every slab test
    cpad = -(-c // 4) * 4
    cbp = jnp.concatenate(
        [cb, jnp.full((cpad - c, 6), bt._INF, jnp.float32)], axis=0)

    @jax.jit
    def counts(o, d, t_hit, cbp):
        def body(carry, cb_blk):
            n_any, n_need = carry
            tn = bt._slab_all(o, d, cb_blk, jnp.full((n,), bt._INF))
            n_any = n_any + jnp.sum((tn < bt._INF), axis=1)
            n_need = n_need + jnp.sum(tn < t_hit[:, None], axis=1)
            return (n_any, n_need), 0.0

        (n_any, n_need), _ = jax.lax.scan(
            body, (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32)),
            cbp.reshape(4, -1, 6))
        return n_any, n_need

    n_any, n_need = counts(o, d, t_hit, cbp)
    n_any, n_need = np.asarray(n_any), np.asarray(n_need)
    miss = np.asarray(hit.prim < 0)
    for name, a in (("slab-pass (any)", n_any), ("needed (< t_hit)", n_need)):
        q = np.percentile(a, [50, 90, 99, 99.9, 100])
        print(f"{name}: mean {a.mean():.1f}  p50 {q[0]:.0f}  p90 {q[1]:.0f}"
              f"  p99 {q[2]:.0f}  p99.9 {q[3]:.0f}  max {q[4]:.0f}"
              f"  total {a.sum()/1e6:.2f} M pairs", flush=True)
    print(f"miss rays: {miss.mean()*100:.1f}%  mean needed on miss "
          f"{n_need[miss].mean():.1f}  on hit {n_need[~miss].mean():.1f}",
          flush=True)
    # work volume at the tri level
    print(f"tri tests if perfect: {n_need.sum()*bt.HCHUNK/1e6:.0f} M "
          f"({n_need.sum()*bt.HCHUNK/n:.0f}/ray)", flush=True)


main()
