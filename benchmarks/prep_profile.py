"""Where do the ~20 s of 1M-tri prepare_scene go? Phase timing via a
lightweight monkeypatch of the expensive sub-steps. Run on TPU."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from scene_throughput import build_scene

T = {}


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    T[name] = T.get(name, 0.0) + time.perf_counter() - t0
    return out


def main():
    scene = build_scene(1_000_000)

    import echorenderer_tpu.scene.prepare as prep
    import echorenderer_tpu.aggregation.bvh as bvh_mod
    import echorenderer_tpu.ops.pallas_intersect as pi
    import echorenderer_tpu.ops.pallas_hier as ph

    orig_bvh = bvh_mod.build_bvh
    bvh_mod.build_bvh = lambda *a, **k: timed("build_bvh", lambda: orig_bvh(*a, **k))
    prep.build_bvh = bvh_mod.build_bvh
    orig_pack = pi.pack_sorted_prims
    pi.pack_sorted_prims = lambda *a, **k: timed("pack_sorted_prims", lambda: orig_pack(*a, **k))
    prep.__dict__.setdefault("_", None)
    orig_hier = ph.build_hier_soa
    ph.build_hier_soa = lambda *a, **k: timed("build_hier_soa", lambda: orig_hier(*a, **k))
    prep.build_hier_soa = ph.build_hier_soa  # bound at import in prepare.py
    orig_soa = pi.build_prim_soa
    pi.build_prim_soa = lambda *a, **k: timed("build_prim_soa", lambda: orig_soa(*a, **k))
    prep.build_prim_soa = pi.build_prim_soa
    orig_asm = prep.assemble_triangles
    prep.assemble_triangles = lambda *a, **k: timed("assemble_triangles", lambda: orig_asm(*a, **k))

    t0 = time.perf_counter()
    prepared = prep.prepare_scene(scene)
    total = time.perf_counter() - t0
    jax.block_until_ready(prepared.hier_soa.prim_chunks)
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v:7.2f} s")
    print(f"  {'TOTAL':24s} {total:7.2f} s (rest {total - sum(T.values()):.2f})")


main()
