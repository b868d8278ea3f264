"""Primitive-cost probe for the binned-traversal packing design
(docs/TRAVERSAL_PLAN.md): measures, on the real device, the cost of every
candidate building block for moving N ray records into chunk-major rows —
multi-operand sorts, XLA gathers at several granularities, one-hot MXU
window gathers — plus the host-sync latency that bounds what bench.py can
time.  Run: `python benchmarks/prim_costs.py`.
"""
import sys, time, functools

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def sync(x):
    """Forced host readback of a reduced scalar (the only trustworthy sync
    through the axon tunnel — VERDICT r2 weak #1)."""
    return float(jnp.sum(jnp.ravel(x)[:16]))


def bench(name, fn, *args, reps=4):
    out = fn(*args)
    sync(out if not isinstance(out, (tuple, list)) else out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    o0 = out if not isinstance(out, (tuple, list)) else out[0]
    s = sync(o0)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:42s} {dt*1e3:9.3f} ms   (chk {s:.3g})", flush=True)
    return dt


def main():
    print(f"backend: {jax.default_backend()}  {jax.devices()}", flush=True)
    rs = np.random.RandomState(0)

    # --- sync latency ---
    tiny = jnp.ones((8, 128))
    sync(tiny)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(tiny)
    print(f"  scalar readback latency: {(time.perf_counter()-t0)/5*1e3:.2f} ms", flush=True)

    for logn in (17, 20):
        n = 2 ** logn
        print(f"--- N = 2^{logn} = {n} ---", flush=True)
        keys = jnp.asarray(rs.randint(0, 4096, n).astype(np.int32))
        fvals = [jnp.asarray(rs.rand(n).astype(np.float32)) for _ in range(9)]
        idx = jnp.asarray(rs.randint(0, n, n).astype(np.int32))

        bench("sort 1op i32", jax.jit(lambda k: jax.lax.sort(k)), keys)
        bench("argsort (key+iota)", jax.jit(lambda k: jnp.argsort(k)), keys)
        bench("sort key + 2 f32 payloads",
              jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1)),
              keys, fvals[0], fvals[1])
        bench("sort key + 9 f32 payloads",
              jax.jit(lambda k, *vs: jax.lax.sort((k,) + vs, num_keys=1)),
              keys, *fvals)
        bench("gather elementwise x[idx]",
              jax.jit(lambda x, i: x[i]), fvals[0], idx)
        tbl8 = jnp.stack(fvals[:8], axis=1)  # (n, 8)
        bench("gather rows (n,8)[idx]",
              jax.jit(lambda x, i: x[i]), tbl8, idx)
        # row gather at 128-wide rows, n/16 indices
        tbl128 = jnp.asarray(rs.rand(n // 16, 128).astype(np.float32))
        idxr = jnp.asarray(rs.randint(0, n // 16, n // 16).astype(np.int32))
        bench("gather rows (n/16,128)[idx n/16]",
              jax.jit(lambda x, i: x[i]), tbl128, idxr)
        bench("take_along_axis 2d (n/16? skip) cumsum",
              jax.jit(lambda x: jnp.cumsum(x)), fvals[0])
        bench("searchsorted 4096 into n",
              jax.jit(lambda a, v: jnp.searchsorted(a, v)),
              jnp.sort(keys), keys)

        # one-hot window gather: within 1024-wide windows, batched matmul.
        # perm = window-local indices (b, 1024); gather 8 payload cols.
        b = n // 1024
        widx = jnp.asarray(rs.randint(0, 1024, (b, 1024)).astype(np.int32))
        payload = tbl8.reshape(b, 1024, 8)

        @jax.jit
        def onehot_window(widx, payload):
            oh = jax.nn.one_hot(widx, 1024, dtype=jnp.float32)  # (b,1024,1024)
            return jnp.einsum('bij,bjk->bik', oh, payload,
                              preferred_element_type=jnp.float32)

        bench("one-hot window 1024 gather 8 cols", onehot_window, widx, payload)

        # scatter-add elementwise (for completeness)
        bench("scatter x.at[idx].set",
              jax.jit(lambda x, i, v: x.at[i].set(v)), fvals[0], idx, fvals[1])

    print("done", flush=True)


main()
