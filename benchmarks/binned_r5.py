"""Round-5 focused binned-traversal benchmark: 1M-tri scene, random rays,
binned trace + occlude only (the r4 baselines: ~2.8 / ~3.0 Mrays/s at 1M
rays). Run on TPU: python benchmarks/binned_r5.py [n_log2=20] [legs]
legs: comma list of trace,occlude,coherent (default trace,occlude)."""
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
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out[0] if isinstance(out, tuple) else (out.t if hasattr(out, 't') else out))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"  {name:30s} {n_rays/dt/1e6:8.2f} Mrays/s   ({dt*1e3:.1f} ms)",
          flush=True)
    return out


def main():
    n_rays = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    legs = (sys.argv[2] if len(sys.argv) > 2 else "trace,occlude").split(",")
    rs = np.random.RandomState(1)
    k, subdiv = 23, 31
    geom, t = make_mesh(k, subdiv)
    print(f"--- 1M scene: {t} tris, {n_rays} rays ---", flush=True)
    bmin, bmax = geometry_bounds(
        {k2: np.asarray(v) for k2, v in geom._asdict().items()})
    bvh = build_bvh(bmin, bmax)
    hier = ph.build_hier_soa(geom, np.asarray(bvh.prim_order))
    print(f"  chunks={hier.num_chunks}", flush=True)

    ext = k * 2.5
    o_r = jnp.asarray(np.stack([
        rs.uniform(0, ext, n_rays), rs.uniform(0, 2.0, n_rays),
        rs.uniform(0, ext, n_rays)], -1).astype(np.float32))
    dd = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d_r = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    ig = jnp.full((n_rays,), -1, jnp.int32)

    if "trace" in legs:
        b = bench("binned trace random",
                  lambda: bt.trace_binned(geom, hier, o_r, d_r, jnp.inf, ig),
                  n_rays)
        hitrate = float(jnp.mean((b.prim >= 0) * 1.0))
        print(f"    hit rate {hitrate:.4f}  checksum {float(jnp.sum(jnp.where(jnp.isfinite(b.t), b.t, 0.0))):.6e}",
              flush=True)
    if "occlude" in legs:
        occ = bench(
            "binned occlude random",
            lambda: bt.occlude_binned(
                geom, hier, o_r, d_r, jnp.full((n_rays,), 5.0), ig),
            n_rays)
        print(f"    blocked {float(jnp.mean(occ * 1.0)):.4f}", flush=True)
    if "coherent" in legs:
        sys.argv = [sys.argv[0], "tiled"]
        o_c, d_c = camera_rays(n_rays, k)
        bench("binned trace coherent",
              lambda: bt.trace_binned(geom, hier, o_c, d_c, jnp.inf, ig),
              n_rays)


main()
