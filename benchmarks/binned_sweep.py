"""Phase-shape sweep for the binned traversal on the 1M-tri random-ray
workload (the config-#5 gate). Serializes everything on the one TPU and
prints a table; designed to run unattended the moment the tunnel is up:

    python benchmarks/binned_sweep.py             # bf16 bounds table
    ECHO_BT_F32TBL=1 python benchmarks/binned_sweep.py prod-only  # A/B leg

Knobs swept (see ops/binned_trace.py): full_rounds (fr), pop width (k),
refill supers (ksup), straggler pop (ks) / refill (tksup), compact
fraction (cf). The "fat single round" family tests the workload-data
hypothesis (mean 7 eligible / 3.5 needed chunks per ray): intersecting
all ~eligible chunks in ONE pack+kernel pass wastes ~2x kernel work but
deletes a full round of sorts.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
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


def bench(name, fn, n_rays, reps=3):
    out = fn()
    sync(out.t if hasattr(out, 't') else out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out.t if hasattr(out, 't') else out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"  {name:44s} {n_rays/dt/1e6:8.2f} Mrays/s   ({dt*1e3:.1f} ms)",
          flush=True)
    return out


def main():
    prod_only = len(sys.argv) > 1 and sys.argv[1] == "prod-only"
    n_rays = 2 ** 17
    rs = np.random.RandomState(1)
    geom, t = make_mesh(23, 31)
    print(f"--- 1M: {t} tris, {n_rays} rays, "
          f"table={'f32' if os.environ.get('ECHO_BT_F32TBL') else 'bf16'} ---",
          flush=True)
    bmin, bmax = geometry_bounds(
        {k2: np.asarray(v) for k2, v in geom._asdict().items()})
    bvh = build_bvh(bmin, bmax)
    hier = ph.build_hier_soa(geom, np.asarray(bvh.prim_order))
    print(f"  chunks={hier.num_chunks}", flush=True)

    ext = 23 * 2.5
    o_r = jnp.asarray(np.stack([
        rs.uniform(0, ext, n_rays), rs.uniform(0, 2.0, n_rays),
        rs.uniform(0, ext, n_rays)], -1).astype(np.float32))
    dd = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d_r = jnp.asarray(dd / np.linalg.norm(dd, axis=-1, keepdims=True))
    ig = jnp.full((n_rays,), -1, jnp.int32)

    # oracle for agreement checks (also the packet-walk baseline)
    href = bench("hier trace random (baseline)",
                 lambda: ph.intersect_hier(geom, hier, o_r, d_r, jnp.inf, ig),
                 n_rays, reps=1)

    configs = [
        ("prod (fr=2 k=4 ksup=4 ks=32 tk=16 cf=16)", {}),
    ]
    if os.environ.get("ECHO_BT_SUP"):
        # keep candidate keys/refill roughly constant as SUP grows
        sup = bt.SUP
        ks_scaled = max(1, 64 // sup)
        configs.append((
            f"sup{sup} scaled (ksup={ks_scaled} tk={max(4, 256 // sup)})",
            dict(ksup=ks_scaled, tail_ksup=max(4, 256 // sup)),
        ))
    if not prod_only:
        configs += [
            ("fat1 (fr=1 k=8)",
             dict(k=8, full_rounds=1)),
            ("fat1 wide (fr=1 k=8 ksup=8)",
             dict(k=8, full_rounds=1, ksup=8)),
            ("fat1 all-eligible (fr=1 k=16 ksup=8)",
             dict(k=16, full_rounds=1, ksup=8)),
            ("prod cf=8", dict(compact_fraction=8)),
            ("prod cf=32", dict(compact_fraction=32)),
            ("fat1 k=8 ks=64 tk=16",
             dict(k=8, full_rounds=1, k_straggler=64)),
            ("no-tail (cf=1 k=4)", dict(compact_fraction=1)),
            ("no-tail fat (cf=1 k=8 ksup=8)",
             dict(compact_fraction=1, k=8, ksup=8)),
        ]
    best = None
    for name, kw in configs:
        b = bench(f"binned {name}",
                  lambda kw=kw: bt.trace_binned(
                      geom, hier, o_r, d_r, jnp.inf, ig, **kw),
                  n_rays)
        agree = float(jnp.mean((href.prim == b.prim) * 1.0))
        print(f"    prim agreement: {agree:.6f}", flush=True)

    # occlude with the production shape
    bench("binned occlude prod",
          lambda: bt.occlude_binned(
              geom, hier, o_r, d_r, jnp.full((n_rays,), 5.0), ig),
          n_rays)

    if not prod_only and not os.environ.get("ECHO_BT_SUP"):
        # superchunk-width legs in subprocesses (SUP is an import-time
        # constant): narrower rank sorts vs wider refills
        import subprocess
        for sup in ("32", "64"):
            print(f"--- SUP={sup} leg ---", flush=True)
            env = dict(os.environ, ECHO_BT_SUP=sup)
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "prod-only"],
                env=env, capture_output=True, text=True, timeout=3600)
            print(p.stdout, flush=True)
            if p.returncode != 0:
                print(p.stderr[-2000:], flush=True)

    if not prod_only:
        # scaling: does throughput rise with wave width (fixed-cost
        # amortization) at the e2e-relevant 512k?
        n_big = 2 ** 19
        o_b = jnp.asarray(np.stack([
            rs.uniform(0, ext, n_big), rs.uniform(0, 2.0, n_big),
            rs.uniform(0, ext, n_big)], -1).astype(np.float32))
        db = rs.normal(size=(n_big, 3)).astype(np.float32)
        d_b = jnp.asarray(db / np.linalg.norm(db, axis=-1, keepdims=True))
        ig_b = jnp.full((n_big,), -1, jnp.int32)
        bench("binned prod 512k rays",
              lambda: bt.trace_binned(geom, hier, o_b, d_b, jnp.inf, ig_b),
              n_big)


main()
