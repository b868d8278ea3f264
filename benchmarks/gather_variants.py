"""r5 micro: isolate the pair-record gather + seg-table costs at production
shape (m=4.2M pairs, n=1M rays, c=3972 chunks), with the record table built
IN-GRAPH from 8 columns (the real round's producer — jit-input tables get a
different layout and measure ~3x faster than the in-loop reality).

Run on TPU: python benchmarks/gather_variants.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def timeit(name, fn, reps=5):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:56s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    n = 2 ** 20
    k = 4
    c = 3972
    m = n * k
    rs = np.random.RandomState(1)
    cols = tuple(jnp.asarray(rs.rand(n).astype(np.float32)) for _ in range(8))
    key0 = jnp.asarray(rs.randint(0, c, m).astype(np.int32))
    q0 = jnp.arange(m, dtype=jnp.int32)
    ks, qs = jax.block_until_ready(jax.lax.sort((key0, q0), num_keys=1))
    rid_np = np.asarray(qs) % n

    rid = jnp.asarray(rid_np)

    def in_graph(make):
        """builder: cols are jit inputs, the table is built IN-graph."""
        f = jax.jit(make)
        return lambda: f(cols, rid)

    def v_take(cs, r):
        rec = jnp.stack(cs, axis=1)
        return jnp.take(rec, r, axis=0)

    def v_cols(cs, r):
        return tuple(jnp.take(col, r) for col in cs)

    def v_complex(cs, r):
        # pack pairs of f32 into complex64 -> half the gathered elements
        re = jnp.stack(cs[0::2], axis=1)
        im = jnp.stack(cs[1::2], axis=1)
        z = jax.lax.complex(re, im)
        g = jnp.take(z, r, axis=0)
        return jnp.real(g), jnp.imag(g)

    def v_flat_slices(cs, r):
        rec_flat = jnp.stack(cs, axis=1).reshape(-1)
        return jax.lax.gather(
            rec_flat, (r * 8)[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(8,),
        )

    a = timeit("(a) take rows of in-graph (n,8) [prod r4]", in_graph(v_take))
    b = timeit("(b) 8 column takes", in_graph(v_cols))
    crev = timeit("(c) complex64 (n,4) row take", in_graph(v_complex))
    # (d) flat slice gather: the r5 attempt that measured 17 s e2e — keep
    # it last and only at 1/16 scale so a serial lowering stays bounded
    rid16 = rid[: m // 16]
    f16 = jax.jit(lambda cs, r: v_flat_slices(cs, r))
    t0 = time.perf_counter()
    jax.block_until_ready(f16(cols, rid16))
    print(f"  (d) flat-slice gather m/16 compile+run    {time.perf_counter()-t0:8.2f} s",
          flush=True)

    # parity: all variants must deliver identical records
    av = np.asarray(a)
    bv = np.stack([np.asarray(x) for x in b], axis=1)
    cv = np.empty_like(av)
    cv[:, 0::2] = np.asarray(crev[0])
    cv[:, 1::2] = np.asarray(crev[1])
    assert np.array_equal(av, bv) and np.array_equal(av, cv)

    # --- seg table: sort vs searchsorted over the sorted seg ids ---
    iota = jnp.arange(m, dtype=jnp.int32)
    s_max = c + 2

    def seg_ids():
        flag = (iota == 0) | (ks != jnp.roll(ks, 1))
        return jnp.cumsum(flag.astype(jnp.int32)) - 1, flag

    def v_sortseg():
        seg_id, flag = seg_ids()
        sc = jax.lax.sort(
            (jnp.where(flag, seg_id, jnp.int32(2**30)), ks), num_keys=1)
        return jnp.minimum(sc[1][:s_max], c - 1)

    def v_search():
        seg_id, flag = seg_ids()
        first_pos = jnp.searchsorted(
            seg_id, jnp.arange(s_max, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        return jnp.minimum(ks[jnp.minimum(first_pos, m - 1)], c - 1)

    sa = timeit("(e) seg table via full sort [prod r4]", jax.jit(v_sortseg))
    sb = timeit("(f) seg table via searchsorted", jax.jit(v_search))
    # real segments must agree exactly; entries past the last segment are
    # never dereferenced (every row position has a real seg id) and may
    # hold any in-range chunk
    seg_np = np.asarray(jax.jit(lambda: seg_ids()[0])())
    n_real = int(seg_np[-1]) + 1
    mism = np.flatnonzero(np.asarray(sa) != np.asarray(sb))
    print(f"  segments real={n_real} s_max={s_max} first mismatch at "
          f"{mism[0] if mism.size else 'none'}", flush=True)
    assert mism.size == 0 or mism[0] >= n_real

    # (g) layout-forced row take: constrain the in-graph (n,8) table to
    # row-major so every gathered row is one contiguous 32 B read
    from jax.experimental.layout import Format, Layout, with_layout_constraint

    def v_take_rm(cs, r):
        rec = jnp.stack(cs, axis=1)
        rec = with_layout_constraint(
            rec, Format(Layout(major_to_minor=(0, 1))))
        return jnp.take(rec, r, axis=0)

    g = timeit("(g) row-major-forced take rows", in_graph(v_take_rm))
    assert np.array_equal(np.asarray(g), av)
    print("parity ok", flush=True)


main()
