"""xprof capture of ONE large-scene e2e program (1M tris, 1080p, spp=1)
plus the aggregated op table — where do the 9.8 s actually go?
Run on TPU."""
import os, sys, time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from scene_throughput import build_scene
from echorenderer_tpu.processes.render import _sample_frame_jit
from echorenderer_tpu.scene.prepare import prepare_scene


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def main():
    t0 = time.perf_counter()
    scene = prepare_scene(build_scene(1_000_000))
    print(f"prep {time.perf_counter()-t0:.1f}s", flush=True)
    res = (1920, 1080)

    def run(start):
        s_sum, _ = _sample_frame_jit(
            scene, "path", res, 0, jnp.asarray(start, jnp.uint32), 1, 6, 2.5)
        return s_sum

    sync(run(0))
    t0 = time.perf_counter()
    sync(run(1))
    print(f"program {time.perf_counter()-t0:.2f}s", flush=True)
    out_dir = "/tmp/xp_e2e"
    os.system(f"rm -rf {out_dir}")
    with jax.profiler.trace(out_dir):
        sync(run(2))
    print("trace captured", flush=True)


main()
