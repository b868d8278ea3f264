"""Capture an xprof trace of one binned random-ray trace (250k tris) and
print the op-level time breakdown. Run on TPU."""
import os, sys, time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
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
    n_rays = 2 ** int(os.environ.get('ECHO_BT_NLOG2', '17'))
    rs = np.random.RandomState(1)
    k = 23
    geom, t = make_mesh(k, 31)
    bmin, bmax = geometry_bounds({k2: np.asarray(v) for k2, v in geom._asdict().items()})
    bvh = build_bvh(bmin, bmax)
    hier = ph.build_hier_soa(geom, np.asarray(bvh.prim_order))
    ext = k * 2.5
    o_r = jnp.asarray(np.stack([
        rs.uniform(0, ext, n_rays), rs.uniform(0, 2.0, n_rays),
        rs.uniform(0, ext, n_rays)], -1).astype(np.float32))
    dd = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d_r = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    ig = jnp.full((n_rays,), -1, jnp.int32)

    k = int(os.environ.get("ECHO_BT_K", "2"))
    ks = int(os.environ.get("ECHO_BT_KS", "8"))
    for name in ("FULL_ROUNDS", "COMPACT_FRACTION", "KSUP", "TAIL_KSUP",
                 "MID_FRACTION", "MID_K", "MID_KSUP", "MID_ROUNDS",
                 "FINAL_FRACTION", "ORD_CAP", "CASCADE_MIN"):
        v = os.environ.get(f"ECHO_BT_{name}")
        if v:
            setattr(bt, name, int(v))
    run = lambda: bt.trace_binned(
        geom, hier, o_r, d_r, jnp.inf, ig, k=k, k_straggler=ks
    )
    sync(run().t)  # compile + warm
    print(f"HCHUNK={bt.HCHUNK} k={k} ks={ks} FULL={bt.FULL_ROUNDS} "
          f"CF={bt.COMPACT_FRACTION} KSUP={bt.KSUP} SUP={bt.SUP}", flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run().t)
        dt = time.perf_counter() - t0
        print(f"{n_rays/dt/1e6:.3f} Mrays/s ({dt*1e3:.0f} ms)", flush=True)
    if os.environ.get("ECHO_BT_TRACE"):
        out_dir = "/tmp/xp_binned"
        os.system(f"rm -rf {out_dir}")
        with jax.profiler.trace(out_dir):
            sync(run().t)
        print("trace captured", flush=True)


main()
