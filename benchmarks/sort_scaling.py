"""XLA sort / gather cost vs element count and operand count on the TPU.
The binned traversal's glue is sort-bound at small waves (6 ms floor); this
probe maps the floor's edge so dispatch sizing and operand slimming target
real numbers. Run on TPU: `python benchmarks/sort_scaling.py`."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def timeit(name, fn, reps=5):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    rs = np.random.RandomState(0)
    for logm in (18, 20, 22, 23):
        m = 1 << logm
        key = jnp.asarray(rs.randint(0, 1 << 12, m).astype(np.int32))
        ops = tuple(jnp.asarray(rs.rand(m).astype(np.float32)) for _ in range(9))
        q = jnp.arange(m, dtype=jnp.int32)
        print(f"--- m = 2^{logm} = {m} ---", flush=True)

        timeit("sort 2-op (key,q)", jax.jit(
            lambda key=key, q=q: jax.lax.sort((key, q), num_keys=1)[1]))
        timeit("sort 10-op", jax.jit(
            lambda key=key, ops=ops, q=q: jax.lax.sort(
                (key,) + ops + (q,), num_keys=1)[9]))
        # row-record gather: (m,) random row ids into an (n, 16) table
        n = max(1024, m // 4)
        tbl = jnp.asarray(rs.rand(n, 16).astype(np.float32))
        ridx = jnp.asarray(rs.randint(0, n, m).astype(np.int32))
        timeit("slice-16 row gather (m rows)", jax.jit(
            lambda tbl=tbl, ridx=ridx: jnp.take(tbl, ridx, axis=0)))
        # row sorts at candidate-buffer widths
        for w in (64, 128, 192):
            if m * w > (1 << 28):
                continue
            rows = jnp.asarray(
                rs.randint(0, 1 << 28, (m // 64, w * 4)).astype(np.int32))
            timeit(f"row sort 1-op ({m//64} x {w*4})", jax.jit(
                lambda rows=rows: jax.lax.sort(rows, dimension=1)))
            # min-extraction pop: 7 passes of reduce-min + mask
            def pop7(rows=rows):
                cur = rows
                outs = []
                for _ in range(7):
                    mn = jnp.min(cur, axis=1)
                    outs.append(mn)
                    cur = jnp.where(cur == mn[:, None], 2**31 - 1, cur)
                return cur + jnp.stack(outs, 1).sum(1, keepdims=True) * 0
            timeit(f"min-extract x7 ({m//64} x {w*4})", jax.jit(pop7))


if __name__ == "__main__":
    main()
