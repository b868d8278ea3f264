"""Marginal cost of every REAL binned-trace phase at production scale,
via the stop_after profiling knob: setup / full rounds / mid stage /
final loop, plus live pending counts at each boundary. Run on TPU:
`python benchmarks/binned_stage_profile.py [n_log2=20]`."""
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


def main():
    n = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    rs = np.random.RandomState(1)
    geom, t = make_mesh(23, 31)
    bmin, bmax = geometry_bounds({k2: np.asarray(v) for k2, v in geom._asdict().items()})
    bvh = build_bvh(bmin, bmax)
    hier = ph.build_hier_soa(geom, np.asarray(bvh.prim_order))
    print(f"tris={t} chunks={hier.num_chunks} rays={n}", flush=True)

    ext = 23 * 2.5
    o = jnp.asarray(np.stack([
        rs.uniform(0, ext, n), rs.uniform(0, 2.0, n),
        rs.uniform(0, ext, n)], -1).astype(np.float32))
    dd = rs.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    ign = jnp.full((n,), -1, jnp.int32)
    tmx = jnp.broadcast_to(jnp.asarray(jnp.inf, jnp.float32), (n,))

    def call(stop=None, fr=None, **kw):
        out = bt._trace_binned_impl(
            o, d, tmx, ign, hier.chunk_bounds, hier.prim_chunks,
            hier.num_tris > 0, hier.num_prims > hier.num_tris,
            kw.pop("k", 4), kw.pop("k_straggler", 32), False, 4096,
            full_rounds=fr, stop_after=stop, **kw)
        return out

    def timed(name, stop=None, fr=None, reps=3, **kw):
        out = call(stop, fr, **kw)
        sync(out[0])
        pend = float(out[1][0]) if stop else -1.0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = call(stop, fr, **kw)
            sync(out[0])
        dt = (time.perf_counter() - t0) / reps
        extra = f"  pend={pend/n*100:5.1f}%" if stop else ""
        print(f"  {name:40s} {dt*1e3:8.1f} ms{extra}", flush=True)
        return dt

    timed("setup only", stop="setup")
    timed("after 1 full round", stop="full", fr=1)
    timed("after 2 full rounds", stop="full", fr=2)
    timed("after mid stage (fr=2)", stop="mid", fr=2)
    timed("after mid stage (fr=1)", stop="mid", fr=1)
    timed("e2e (fr=2, default)", fr=2)
    timed("e2e (fr=1)", fr=1)


main()
