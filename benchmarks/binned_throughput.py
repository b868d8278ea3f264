"""Binned-traversal throughput vs the packet walk on incoherent rays —
the config-#5 gate (VERDICT r2 #2). Run on TPU:
`python benchmarks/binned_throughput.py [n_rays_log2]`."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from trace_throughput import make_mesh, camera_rays
from echorenderer_tpu.ops import pallas_hier as ph
from echorenderer_tpu.ops import binned_trace as bt
from echorenderer_tpu.aggregation.bvh import build_bvh, geometry_bounds


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def bench(name, fn, n_rays, reps=3):
    out = fn()
    sync(out[0] if isinstance(out, tuple) else (out.t if hasattr(out, 't') else out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out[0] if isinstance(out, tuple) else (out.t if hasattr(out, 't') else out))
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:34s} {n_rays/dt/1e6:8.2f} Mrays/s   ({dt*1e3:.1f} ms)", flush=True)
    return out


def main():
    n_rays = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 17)
    rs = np.random.RandomState(1)
    for label, k, subdiv in [("250k", 16, 22), ("1M", 23, 31)]:
        geom, t = make_mesh(k, subdiv)
        print(f"--- {label}: {t} tris, {n_rays} rays ---", flush=True)
        bmin, bmax = geometry_bounds({k2: np.asarray(v) for k2, v in geom._asdict().items()})
        bvh = build_bvh(bmin, bmax)
        hier = ph.build_hier_soa(geom, np.asarray(bvh.prim_order))
        print(f"  chunks={hier.num_chunks}", flush=True)

        # coherent camera rays (tiled order)
        sys.argv = [sys.argv[0], "tiled"]
        o_c, d_c = camera_rays(n_rays, k)
        # incoherent: random origins in the scene volume, random directions
        ext = k * 2.5
        o_r = jnp.asarray(np.stack([
            rs.uniform(0, ext, n_rays), rs.uniform(0, 2.0, n_rays),
            rs.uniform(0, ext, n_rays)], -1).astype(np.float32))
        dd = rs.normal(size=(n_rays, 3)).astype(np.float32)
        d_r = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
        ig = jnp.full((n_rays,), -1, jnp.int32)

        h1 = bench("hier trace coherent", lambda: ph.intersect_hier(geom, hier, o_c, d_c, jnp.inf, ig), n_rays)
        b1 = bench("binned trace coherent", lambda: bt.trace_binned(geom, hier, o_c, d_c, jnp.inf, ig), n_rays)
        agree = float(jnp.mean((h1.prim == b1.prim) * 1.0))
        print(f"    prim agreement: {agree:.6f}", flush=True)
        h2 = bench("hier trace random", lambda: ph.intersect_hier(geom, hier, o_r, d_r, jnp.inf, ig), n_rays)
        b2 = bench("binned trace random", lambda: bt.trace_binned(geom, hier, o_r, d_r, jnp.inf, ig), n_rays)
        agree = float(jnp.mean((h2.prim == b2.prim) * 1.0))
        print(f"    prim agreement: {agree:.6f}", flush=True)
        bench("hier occlude random", lambda: ph.occlude_hier(geom, hier, o_r, d_r, jnp.full((n_rays,), 5.0), ig), n_rays)
        bench("binned occlude random", lambda: bt.occlude_binned(geom, hier, o_r, d_r, jnp.full((n_rays,), 5.0), ig), n_rays)


main()
