"""Profile one wavefront device program end-to-end on the 250k-tri scene
(the integrated binned-traversal path). Run on TPU."""
import os, sys, time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from scene_throughput import build_scene
from echorenderer_tpu.scene.prepare import prepare_scene
from echorenderer_tpu.processes.render import _sample_frame_jit


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    res = (320, 180)
    spp = 8
    scene = prepare_scene(build_scene(n_tris))
    run = lambda s0: _sample_frame_jit(
        scene, "path", res, 0, jnp.asarray(s0, jnp.uint32), spp, 6, 2.5
    )[0]
    sync(run(0))
    t0 = time.perf_counter()
    sync(run(8))
    dt = time.perf_counter() - t0
    n_samples = res[0] * res[1] * spp
    print(f"{n_samples/dt/1e6:.3f} Mspps ({dt*1e3:.0f} ms)", flush=True)
    out_dir = "/tmp/xp_wave"
    os.system(f"rm -rf {out_dir}")
    with jax.profiler.trace(out_dir):
        sync(run(16))
    print("trace captured", flush=True)


main()
