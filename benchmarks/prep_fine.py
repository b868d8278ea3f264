"""Fine-grained prepare_scene phase profile (fresh-process, warm compile
cache — exactly the bench's prepare_seconds conditions). Run on TPU."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from scene_throughput import build_scene

T = {}


def timed(name, fn, sync=False):
    t0 = time.perf_counter()
    out = fn()
    if sync:
        jax.block_until_ready(out)
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
    ph_bvh = bvh_mod.build_bvh

    orig_pack = pi.pack_sorted_prims
    pi.pack_sorted_prims = lambda *a, **k: timed("pack_sorted_prims", lambda: orig_pack(*a, **k))
    prep.pack_sorted_prims = pi.pack_sorted_prims

    orig_rows = ph._pack_chunk_rows
    ph._pack_chunk_rows = lambda *a, **k: timed(
        "  pack_chunk_rows(sync)", lambda: orig_rows(*a, **k), sync=True)

    orig_ct = ph._chunk_tree
    ph._chunk_tree = lambda *a, **k: timed("  chunk_tree", lambda: orig_ct(*a, **k))

    orig_hier = ph.build_hier_soa
    ph.build_hier_soa = lambda *a, **k: timed("build_hier_soa", lambda: orig_hier(*a, **k))
    prep.build_hier_soa = ph.build_hier_soa

    orig_soa = pi.build_prim_soa
    pi.build_prim_soa = lambda *a, **k: timed("build_prim_soa", lambda: orig_soa(*a, **k))
    prep.build_prim_soa = pi.build_prim_soa

    orig_asm = prep.assemble_triangles
    prep.assemble_triangles = lambda *a, **k: timed("assemble_triangles", lambda: orig_asm(*a, **k))

    orig_shade = prep._assemble_shade
    prep._assemble_shade = lambda *a, **k: timed(
        "assemble_shade(sync)", lambda: orig_shade(*a, **k), sync=True)

    orig_gb = bvh_mod.geometry_bounds
    bvh_mod.geometry_bounds = lambda *a, **k: timed("geometry_bounds", lambda: orig_gb(*a, **k))
    prep.geometry_bounds = bvh_mod.geometry_bounds

    class JnpProxy:
        def __getattr__(self, n):
            v = getattr(jnp, n)
            if n == "asarray":
                return lambda *a, **k: timed("jnp.asarray(total)", lambda: v(*a, **k))
            return v

    prep.jnp = JnpProxy()

    orig_add = prep.Collector.add
    prep.Collector.add = lambda self, *a, **k: timed(
        "scene_walk_add", lambda: orig_add(self, *a, **k))
    orig_bma = prep.build_material_arrays
    prep.build_material_arrays = lambda *a, **k: timed(
        "build_material_arrays", lambda: orig_bma(*a, **k))

    t0 = time.perf_counter()
    prepared = prep.prepare_scene(scene)
    jax.block_until_ready(prepared.hier_soa.prim_chunks)
    jax.block_until_ready(prepared.shade_pack)
    total = time.perf_counter() - t0
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v:7.2f} s", flush=True)
    print(f"  {'TOTAL':24s} {total:7.2f} s", flush=True)
    # second call in-process: tracing cached, shows the floor
    T.clear()
    t0 = time.perf_counter()
    prepared = prep.prepare_scene(scene)
    jax.block_until_ready(prepared.hier_soa.prim_chunks)
    total = time.perf_counter() - t0
    print("  --- second call (in-process floor) ---", flush=True)
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v:7.2f} s", flush=True)
    print(f"  {'TOTAL':24s} {total:7.2f} s", flush=True)


main()
