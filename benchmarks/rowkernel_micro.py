"""Time the REAL binned row kernel (`binned_trace._run_rows`) on a
synthetic single-chunk workload: every 128-lane sub-row intersects chunk
0, so the measured cost is pure kernel arithmetic + DMA (the chunk stays
resident). Establishes the true ns/pair baseline for the MXU-Plücker
variant. Run on TPU: python benchmarks/rowkernel_micro.py [n_log2=20]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from echorenderer_tpu.ops import binned_trace as bt

H = 256


def main():
    n = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    rs = np.random.RandomState(7)
    v0 = rs.uniform(0, 4, (3, H)).astype(np.float32)
    e1 = rs.normal(0, 0.25, (3, H)).astype(np.float32)
    e2 = rs.normal(0, 0.25, (3, H)).astype(np.float32)
    C = 16  # replicate the chunk so rows alternate between 16 chunks
    prim_chunks = jnp.asarray(np.tile(np.concatenate(
        [v0, e1, e2, np.zeros((7, H), np.float32)], 0)[None], (C, 1, 1)))

    o = rs.uniform(0, 4, (n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    r8 = n // 1024
    shape3 = (r8, 8, 128)
    n_rows = r8 * 8
    cols = tuple(jnp.asarray(o[:, a]).reshape(shape3) for a in range(3)) + \
        tuple(jnp.asarray(d[:, a]).reshape(shape3) for a in range(3)) + (
        jnp.full(shape3, 3.4e38, jnp.float32),   # tmax
        jnp.full(shape3, -1.0, jnp.float32),     # ign
    )
    # each row = one segment; row r's chunk = r % C
    sfirst = jnp.arange(n_rows, dtype=jnp.int32)
    scount = jnp.ones((n_rows,), jnp.int32)
    seg_chunk = jnp.arange(n_rows, dtype=jnp.int32) % C
    tbl = jnp.concatenate([sfirst, scount, seg_chunk])
    seg = jnp.repeat(jnp.arange(n_rows, dtype=jnp.int32), 128).astype(
        jnp.float32).reshape(shape3)
    cols = cols + (seg,)

    run = jax.jit(lambda: bt._run_rows(
        tbl, cols, prim_chunks, True, False, True))

    out = run()
    out.block_until_ready()
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = run()
    float(jnp.sum(out.ravel()[:8]))
    dt = (time.perf_counter() - t0) / reps
    hits = float(jnp.mean((out != 2**31 - 1) * 1.0))
    print(f"real row kernel: {dt*1e3:7.2f} ms  {dt/n*1e9:6.2f} ns/pair  "
          f"hit-rate {hits:.4f}")


main()
