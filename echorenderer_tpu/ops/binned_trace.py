"""Binned wavefront traversal: per-ray chunk selection + chunk-major
row intersection (docs/TRAVERSAL_PLAN.md; prototype of the design that
replaces packet traversal for incoherent rays).

Every traversal kernel so far makes ONE cull decision per 1024-ray packet,
which collapses when bounce rays diverge (0.16 Mrays/s at 250k tris). Here
each ray culls independently and the *intersection* work is what gets
batched:

1. Every ray slab-tests every chunk AABB (a (N, C) broadcast the VPU eats:
   ~20 flops/pair, C <= a few thousand chunks of 256 prims).
2. Rounds in strict near-to-far order: each round selects each ray's K
   nearest not-yet-visited chunks with entry distance below its current
   best hit (a lexicographic (t_entry, chunk) frontier makes "visited"
   a two-scalar comparison — no per-(ray, chunk) state).
3. The selected (ray, chunk) pairs are sorted chunk-major and packed into
   128-lane rows that each reference ONE chunk. A Pallas kernel walks the
   rows; a scalar-prefetch-driven index map streams each row's chunk
   (automatically pipelined by the grid), `_chunk_hits` does the math —
   identical intersection/findFar semantics to every other path.
4. Results scatter-min back per ray; rays whose remaining chunks start
   beyond their best hit contribute no further pairs.

The near-to-far rounds give per-ray early termination (the packet kernels
only get it packet-wide): after round 1 most rays' best-t excludes
everything else.

STATUS (end of round 2): correct — exact prim agreement with the packet
walk and the linear oracle, findFar/ignore semantics included — but not
yet faster: ~0.08 Mrays/s on 128k random rays at 250k tris vs the packet
walk's 0.17. What was measured and already fixed: TPU scatters in the
packing (rewritten gather-only), double eligibility scans (selection now
carried across rounds), dead kernel rows (per-sub-row occupancy gates).
What remains, in measured order:
  1. The (N, C) slab scan costs ~30 ms per round at 128k x 968 — it is
     HBM-bandwidth on the (N, C) intermediates, and straggler rays force
     ~8+ full-size rounds. Fix: two-level selection — slab against ~C/16
     superchunk AABBs first, then refine only each ray's surviving
     superchunks via small gathers; plus per-round survivor compaction so
     late rounds run at a fraction of N.
  2. The row kernel serializes ~8 chunk-DMA waits per block. Fix:
     pipeline the double buffer ACROSS grid blocks, or chunk-group rows
     so a prefetch-driven index map can stream them.
The driver math (lex frontier, gather-only packing, near-to-far rounds)
is the hard part and is tested. See docs/TRAVERSAL_PLAN.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import INF, Hit
from .pallas_hier import HCHUNK, HierSoA, _sorted_ignore
from .pallas_intersect import _chunk_hits, _interpret

_INF = 3.4e38
ROW = 128  # rays per kernel row (one chunk per row)


def _row_kernel(cids_ref, ox, oy, oz, dx, dy, dz, tmax, ign, prim_hbm,
                t_out, p_out, u_out, v_out, pscratch, sem0, sem1,
                *, has_tri, has_sph):
    """One block = 8 sub-rows of 128 rays; sub-row s intersects chunk
    cids[i*8+s], double-buffer DMA'd so the next chunk flies while this
    one computes."""
    i = pl.program_id(0)

    def start(s, buf):
        cp = pltpu.make_async_copy(
            prim_hbm.at[cids_ref[i * 8 + s]], pscratch.at[buf],
            sem0 if buf == 0 else sem1,
        )
        cp.start()

    def wait(s, buf):
        pltpu.make_async_copy(
            prim_hbm.at[cids_ref[i * 8 + s]], pscratch.at[buf],
            sem0 if buf == 0 else sem1,
        ).wait()

    # per-sub-row occupancy: rows holding only padding (tmax <= 0) skip
    # their DMA and intersection outright — straggler rounds, where most
    # of the padded row grid is empty, cost microseconds per block instead
    # of the full chunk-stream price
    alive = [jnp.any(tmax[0, s : s + 1, :] > 0.0) for s in range(8)]

    # defaults first (every output slot must be written)
    t_out[:] = tmax[:]
    p_out[:] = jnp.full_like(tmax[:], -1.0)
    u_out[:] = jnp.zeros_like(tmax[:])
    v_out[:] = jnp.zeros_like(tmax[:])

    pl.when(alive[0])(lambda: start(0, 0))
    for s in range(8):
        buf = s % 2
        if s + 1 < 8:
            pl.when(alive[s + 1])(
                lambda s=s, buf=buf: start(s + 1, 1 - buf)
            )

        @pl.when(alive[s])
        def _(s=s, buf=buf):
            wait(s, buf)
            rows = pscratch[buf]  # (16, HCHUNK)
            row = lambda r: r[s : s + 1, :]  # (1, 128) sub-row
            best_t = row(tmax[0])
            best_p = jnp.full_like(best_t, -1.0)
            best_u = jnp.zeros_like(best_t)
            best_v = jnp.zeros_like(best_t)
            for sub in range(HCHUNK // 128):
                blk = [rows[k : k + 1, sub * 128 : (sub + 1) * 128] for k in range(10)]
                k_base = (cids_ref[i * 8 + s] * HCHUNK + sub * 128).astype(jnp.float32)
                t, u, v, pid = _chunk_hits(
                    blk, k_base,
                    row(ox[0]), row(oy[0]), row(oz[0]),
                    row(dx[0]), row(dy[0]), row(dz[0]), row(ign[0]),
                    has_tri, has_sph,
                )
                tm = jnp.min(t, axis=0, keepdims=True)
                sel = t <= tm
                pm = jnp.min(jnp.where(sel, pid, _INF), axis=0, keepdims=True)
                sel2 = sel & (pid == pm)
                um = jnp.sum(jnp.where(sel2, u, 0.0), axis=0, keepdims=True)
                vm = jnp.sum(jnp.where(sel2, v, 0.0), axis=0, keepdims=True)
                closer = tm < best_t
                best_t = jnp.where(closer, tm, best_t)
                best_p = jnp.where(closer, pm, best_p)
                best_u = jnp.where(closer, um, best_u)
                best_v = jnp.where(closer, vm, best_v)
            t_out[0, s : s + 1, :] = best_t
            p_out[0, s : s + 1, :] = best_p
            u_out[0, s : s + 1, :] = best_u
            v_out[0, s : s + 1, :] = best_v


@functools.partial(jax.jit, static_argnames=("has_tri", "has_sph"))
def _intersect_rows(row_chunk, cols, prim_chunks, has_tri, has_sph):
    """cols: 8 arrays (R8, 8, 128) [o, d, tmax, ign]; row_chunk (R8*8,)
    one chunk id per sub-row. Returns (t, p, u, v) of shape (R8, 8, 128)."""
    r8 = cols[0].shape[0]
    kernel = functools.partial(_row_kernel, has_tri=has_tri, has_sph=has_sph)
    ray_spec = pl.BlockSpec(
        (1, 8, ROW), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r8,),
        in_specs=[ray_spec] * 8 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ray_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, 16, HCHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((r8, 8, ROW), jnp.float32)] * 4
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(row_chunk, *cols, prim_chunks)


def _slab_all(o, d, cb, limit):
    """(N, C) chunk entry distances; +INF where the ray misses the box or
    enters beyond `limit`."""
    inv = jnp.where(jnp.abs(d) < 1e-12, 1e12 * jnp.where(d < 0, -1.0, 1.0), 1.0 / d)
    lo = cb[:, 0:3]  # (C, 3)
    hi = cb[:, 3:6]
    t0 = (lo[None] - o[:, None]) * inv[:, None]  # (N, C, 3)
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    ok = (tn <= tf) & (tf > 0.0) & (tn < limit[:, None])
    return jnp.where(ok, jnp.maximum(tn, 0.0), _INF)


@functools.partial(
    jax.jit, static_argnames=("has_tri", "has_sph", "rounds", "k")
)
def _trace_binned_impl(o, d, t_max, ign_sorted, cb, prim_chunks,
                       has_tri, has_sph, rounds, k):
    n = o.shape[0]
    c = cb.shape[0]
    iota_c = jnp.arange(c, dtype=jnp.int32)
    m = n * k
    # per-chunk padding bound + 1 dedicated dump row for invalid pairs,
    # rounded to the kernel's 8-row blocks
    r_max = -(-(-(-m // ROW) + c + 1) // 8) * 8

    best_t0 = jnp.minimum(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), _INF)
    state = dict(
        best_t=best_t0,
        best_p=jnp.full((n,), -1.0),
        best_u=jnp.zeros((n,)),
        best_v=jnp.zeros((n,)),
        # lexicographic (entry t, chunk id) frontier: everything at or
        # below it has been visited
        f_t=jnp.full((n,), -1.0),
        f_c=jnp.full((n,), -1, jnp.int32),
        rounds=jnp.zeros((), jnp.int32),
    )

    def select(best_t, f_t, f_c):
        """ONE (N, C) scan + k argmin passes: each ray's k nearest
        unvisited chunks (argmin's first-occurrence tie-break IS the
        (t, chunk) lex order). This is the round's bandwidth cost, so the
        result is carried: computed at the END of each round for the next."""
        tn = _slab_all(o, d, cb, best_t)
        tn_m = jnp.where(
            (tn < _INF)
            & (
                (tn > f_t[:, None])
                | ((tn == f_t[:, None]) & (iota_c[None] > f_c[:, None]))
            ),
            tn,
            _INF,
        )
        sel_c, sel_t = [], []
        for _k in range(k):
            idx = jnp.argmin(tn_m, axis=1).astype(jnp.int32)
            tv = jnp.take_along_axis(tn_m, idx[:, None], axis=1)[:, 0]
            sel_c.append(jnp.where(tv < _INF, idx, -1))
            sel_t.append(tv)
            tn_m = jnp.where(iota_c[None] == idx[:, None], _INF, tn_m)
        return jnp.stack(sel_c, 1), jnp.stack(sel_t, 1)  # (N, K) each

    state["sel_c"], state["sel_t"] = select(
        state["best_t"], state["f_t"], state["f_c"]
    )

    def cond(st):
        return (st["rounds"] < rounds) & jnp.any(st["sel_c"] >= 0)

    def body(st):
        sel_c, sel_t = st["sel_c"], st["sel_t"]

        # advance the frontier past everything selected this round
        any_sel = sel_t < _INF
        last = jnp.max(jnp.where(any_sel, sel_t, -_INF), axis=1)
        last_c = jnp.max(jnp.where((sel_t == last[:, None]) & any_sel, sel_c, -1), axis=1)
        has_any = jnp.any(any_sel, 1)
        f_t = jnp.where(has_any, last, st["f_t"])
        f_c = jnp.where(has_any, last_c, st["f_c"])

        # ---- pack valid (ray, chunk) pairs into chunk-pure 128-lane rows.
        # Everything below is gathers + sorts + prefix sums — TPU scatters
        # are serialization-prone and were the previous bottleneck.
        pc = sel_c.reshape(-1)
        pl_ = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)
        ).reshape(-1)
        valid = pc >= 0
        sort_key = jnp.where(valid, pc, c)  # invalid pairs sort last
        order = jnp.argsort(sort_key)
        pc_s = sort_key[order]
        pl_s = pl_[order]

        first = jnp.searchsorted(pc_s, jnp.arange(c + 1, dtype=jnp.int32), side="left")
        counts = first[1:] - first[:-1]  # (C,) pairs per chunk
        rows_per = -(-counts // ROW)
        cum_rows = jnp.cumsum(rows_per)  # (C,)
        row_start = cum_rows - rows_per

        # slot -> pair (pure arithmetic): row r belongs to the chunk whose
        # row range covers it; its pairs start at first[ch] + offset
        rows_iota = jnp.arange(r_max, dtype=jnp.int32)
        ch_of_row = jnp.searchsorted(cum_rows, rows_iota, side="right").astype(jnp.int32)
        ch_clamped = jnp.clip(ch_of_row, 0, c - 1)
        row_chunk = jnp.where(ch_of_row < c, ch_clamped, 0)
        pair_base = first[ch_clamped] + (rows_iota - row_start[ch_clamped]) * ROW
        lane_iota = jnp.arange(ROW, dtype=jnp.int32)
        pair_idx = pair_base[:, None] + lane_iota[None, :]  # (R, ROW)
        slot_ok = (ch_of_row[:, None] < c) & (
            pair_idx < (first[ch_clamped] + counts[ch_clamped])[:, None]
        )
        pair_lane = pl_s[jnp.clip(pair_idx, 0, m - 1)]  # (R, ROW) ray ids

        def gather(a, fill):
            g = a[pair_lane]
            return jnp.where(slot_ok, g, fill).reshape(r_max // 8, 8, ROW)

        cols = (
            gather(o[:, 0], 0.0), gather(o[:, 1], 0.0), gather(o[:, 2], 0.0),
            gather(d[:, 0], 0.0), gather(d[:, 1], 0.0), gather(d[:, 2], 1.0),
            gather(st["best_t"], 0.0),  # current best caps the row's search
            gather(ign_sorted.astype(jnp.float32), -1.0),
        )
        t_r, p_r, u_r, v_r = _intersect_rows(
            row_chunk, cols, prim_chunks, has_tri, has_sph
        )

        # ---- results back to (N, K) pair grid (gathers only), then a
        # per-ray min-reduce with a lowest-prim-id tie-break
        flat = lambda x: x.reshape(r_max * ROW)
        # sorted pair j sits at slot row*ROW + lane; invert analytically:
        srt = jnp.arange(m, dtype=jnp.int32)
        rank = srt - first[jnp.clip(pc_s, 0, c - 1)]
        slot = jnp.where(
            pc_s < c,
            (row_start[jnp.clip(pc_s, 0, c - 1)] + rank // ROW) * ROW + rank % ROW,
            r_max * ROW - 1,
        )
        inv = jnp.argsort(order)  # original pair -> sorted position
        slot_of_pair = slot[inv]
        pt = flat(t_r)[slot_of_pair].reshape(n, k)
        pp = flat(p_r)[slot_of_pair].reshape(n, k)
        pu = flat(u_r)[slot_of_pair].reshape(n, k)
        pv = flat(v_r)[slot_of_pair].reshape(n, k)
        hitp = (sel_c >= 0) & (pp >= 0.0)
        pt = jnp.where(hitp, pt, _INF)
        rt = jnp.min(pt, axis=1)
        rp = jnp.min(jnp.where(pt == rt[:, None], pp, _INF), axis=1)
        match = (pt == rt[:, None]) & (pp == rp[:, None])
        ru = jnp.max(jnp.where(match, pu, -_INF), axis=1)
        rv = jnp.max(jnp.where(match, pv, -_INF), axis=1)

        better = rt < st["best_t"]  # strict: an earlier equal hit stays
        new_best_t = jnp.where(better, rt, st["best_t"])
        next_c, next_t = select(new_best_t, f_t, f_c)
        return dict(
            best_t=new_best_t,
            best_p=jnp.where(better, rp, st["best_p"]),
            best_u=jnp.where(better, ru, st["best_u"]),
            best_v=jnp.where(better, rv, st["best_v"]),
            f_t=f_t,
            f_c=f_c,
            rounds=st["rounds"] + 1,
            sel_c=next_c,
            sel_t=next_t,
        )

    st = jax.lax.while_loop(cond, body, state)
    return st["best_t"], st["best_p"], st["best_u"], st["best_v"]


def trace_binned(geom, soa: HierSoA, o, d, t_max, ignore, *, rounds: int = 6,
                 k: int = 4) -> Hit:
    """Closest-hit via binned traversal; same contract as intersect_hier
    (non-instanced scenes: Hit.prim in storage ids, findFar semantics)."""
    assert not soa.instanced, "binned traversal: instancing lands with integration"
    n = o.shape[0]
    ign = _sorted_ignore(soa, ignore)
    t, p, u, v = _trace_binned_impl(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), ign,
        soa.chunk_bounds, soa.prim_chunks,
        soa.num_tris > 0, soa.num_prims > soa.num_tris, rounds, k,
    )
    sorted_id = jnp.clip(p, 0.0, soa.order.shape[0] - 1).astype(jnp.int32)
    prim = jnp.where(p >= 0.0, soa.order[sorted_id], -1)
    found = prim >= 0
    return Hit(
        t=jnp.where(found, t, INF),
        prim=jnp.where(found, prim, -1),
        uv=jnp.stack([jnp.where(found, u, 0.0), jnp.where(found, v, 0.0)], -1),
        inst=jnp.zeros((n,), jnp.int32),
    )
