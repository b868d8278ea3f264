"""Op-level xprof of the fused binned-trace full rounds at 1M rays x 1M
tris: captures a jax.profiler trace of fr=2/stop_after='full' (the two
full-width rounds + setup only) and aggregates device time per op.
Run on TPU: python benchmarks/binned_xprof.py [n_log2=20] [outdir]"""
import os, sys, time

os.environ.setdefault(
    "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
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
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xp_binned"
    rs = np.random.RandomState(1)
    geom, t = make_mesh(23, 31)
    bmin, bmax = geometry_bounds(
        {k2: np.asarray(v) for k2, v in geom._asdict().items()})
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

    def call():
        return bt._trace_binned_impl(
            o, d, tmx, ign, hier.chunk_bounds, hier.prim_chunks,
            hier.num_tris > 0, hier.num_prims > hier.num_tris,
            4, 32, False, 4096, full_rounds=2, stop_after="full")

    sync(call()[0])  # compile
    t0 = time.perf_counter()
    sync(call()[0])
    print(f"fr=2 stop=full: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    with jax.profiler.trace(out):
        for _ in range(2):
            sync(call()[0])
    print(f"trace written to {out}", flush=True)


main()
