"""Round-4 micro: the per-round pair-record question at production scale.
A round must deliver 8 ray floats per sorted pair. Contenders:
  (a) 2-op sort (key, q) + (m, 8) row gather   [current production]
  (b) 10-op sort carrying all fields           [ECHO_BT_PACK10 oracle]
  (c) 2-op sort + 2x (m, 4) gathers
  (d) 2-op sort + gather of (n, 8) viewed as (n, 4) c64-ish pairs -- n/a
Also times the unpack (2-op back sort) and a full-width vs quarter-width
sweep (the progressive-compaction schedule decision). Run on TPU."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def timeit(name, fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    n = 2 ** 20
    c = 3972
    rs = np.random.RandomState(1)
    rec = jnp.asarray(rs.rand(n, 8).astype(np.float32))
    for k in (4, 2, 1):
        m_pad = -(-(n * k) // 1024) * 1024
        key = jnp.asarray(rs.randint(0, c, m_pad).astype(np.int32))
        q = jnp.arange(m_pad, dtype=jnp.int32)
        print(f"-- m_pad = {m_pad} (k={k}) --", flush=True)

        def two_op():
            ks, qs = jax.lax.sort((key, q), num_keys=1)
            g = jnp.take(rec, qs % n, axis=0)
            return g

        timeit("(a) 2-op sort + (m,8) row gather", jax.jit(two_op))

        fields = tuple(
            jnp.asarray(rs.rand(m_pad).astype(np.float32)) for _ in range(8)
        )

        def ten_op():
            srt = jax.lax.sort((key,) + fields + (q,), num_keys=1)
            return srt[1]

        timeit("(b) 10-op sort", jax.jit(ten_op))

        def two_plus_two():
            ks, qs = jax.lax.sort((key, q), num_keys=1)
            r = qs % n
            g1 = jnp.take(rec[:, :4], r, axis=0)
            g2 = jnp.take(rec[:, 4:], r, axis=0)
            return g1, g2

        timeit("(c) 2-op sort + 2x (m,4) gathers", jax.jit(two_plus_two))

        def unpack():
            res = key  # stand-in i32 payload
            back = jax.lax.sort((q, res), num_keys=1)
            return back[1]

        timeit("(d) unpack 2-op back sort", jax.jit(unpack))

        def gather16():
            qs = jax.lax.sort((key, q), num_keys=1)[1]
            rec16 = jnp.concatenate([rec, rec], axis=1)
            return jnp.take(rec16, qs % n, axis=0)

        timeit("(e) (m,16) row gather (width test)", jax.jit(gather16))


main()
