"""Quick binned-only throughput check: random rays at 1M tris (the
config-#5 gate). Forced-readback sync. Run on TPU:
`python benchmarks/binned_quick.py [n_log2=20]`."""
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
    n_rays = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    rs = np.random.RandomState(1)
    geom, t = make_mesh(23, 31)
    print(f"--- 1M: {t} tris, {n_rays} rays ---", flush=True)
    bmin, bmax = geometry_bounds({k2: np.asarray(v) for k2, v in geom._asdict().items()})
    bvh = build_bvh(bmin, bmax)
    hier = ph.build_hier_soa(geom, np.asarray(bvh.prim_order))
    print(f"  chunks={hier.num_chunks}", flush=True)

    sys.argv = [sys.argv[0], "tiled"]
    o_c, d_c = camera_rays(n_rays, 23)
    ext = 23 * 2.5
    o_r = jnp.asarray(np.stack([
        rs.uniform(0, ext, n_rays), rs.uniform(0, 2.0, n_rays),
        rs.uniform(0, ext, n_rays)], -1).astype(np.float32))
    dd = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d_r = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    ig = jnp.full((n_rays,), -1, jnp.int32)

    b2 = bench("binned trace random", lambda: bt.trace_binned(geom, hier, o_r, d_r, jnp.inf, ig), n_rays)
    bench("binned trace coherent", lambda: bt.trace_binned(geom, hier, o_c, d_c, jnp.inf, ig), n_rays)
    bench("binned occlude random", lambda: bt.occlude_binned(geom, hier, o_r, d_r, jnp.full((n_rays,), 5.0), ig), n_rays)
    # exactness spot check vs the packet walk on a small slice
    h = ph.intersect_hier(geom, hier, o_r[:4096], d_r[:4096], jnp.inf, ig[:4096])
    b = bt.trace_binned(geom, hier, o_r[:4096], d_r[:4096], jnp.inf, ig[:4096])
    agree = float(jnp.mean((h.prim == b.prim) * 1.0))
    print(f"  prim agreement (4k slice): {agree:.6f}", flush=True)


main()
