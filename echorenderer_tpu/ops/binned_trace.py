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

STATUS (end of round 2): CORRECT and converging in ~8 rounds — exact
prim agreement with the packet walk and the linear oracle on every test
(multi-super scenes, findFar, ignore) — but not yet faster: ~2.6 s warm
for 128k random rays at 250k tris (0.05 Mrays/s) vs the packet walk's
0.17. The selection side is done: two-level ranking by per-(ray, super)
ADVANCING lower bounds (min remaining eligible chunk entry; rotates
consumed supers out of the gather slots — ranking by the static box entry
livelocks, as does clamping entry distances to 0, which ties every
origin-enclosing chunk), guard-capped lex frontier with STRICT tie
handling, gather-only packing, carried selections, per-sub-row occupancy
gates. xprof (trace at /tmp/xp_b2, HLO fusion map in git log) shows the row
KERNEL is cheap — the wall is the XLA driver's random gathers: packing
the kernel columns costs 8 gathers of 650k slots at ~14 ms each per
round (fusion.277/281: TPU element gathers run ~200 MB/s), plus
(131072, 1)-shaped reduction fusions with pathological T(1,128) layouts
(fusion.274/278, ~17 ms each). The super-bounds refinement was already
moved to a one-hot MXU lookup (no change — it was never the bottleneck).
Round 3: move the PACKING into a Pallas pass (the sorted pair index is
already computed; a kernel can DMA ray records into rows instead of XLA
element-gathering them), keep sorts/prefix-sums in XLA, and compact
survivors between rounds. See docs/TRAVERSAL_PLAN.md.
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
SUP = 16  # chunks per superchunk (two-level selection)
KSUP = 4  # superchunks gathered per ray per round


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
    # RAW entry distance (can be negative when the origin is inside the
    # box): clamping to 0 made every origin-enclosing chunk tie at
    # exactly 0.0 and the tie-safe frontier could then never advance
    return jnp.where(ok, tn, _INF)


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

    # ---- two-level chunk selection tables (computed once per trace):
    # supers of SUP consecutive chunks (BVH-leaf order => spatially tight)
    s_count = -(-c // SUP)
    c_pad = s_count * SUP
    cb_pad = jnp.concatenate(
        [
            cb,
            jnp.tile(
                jnp.asarray([[_INF, _INF, _INF, -_INF, -_INF, -_INF]], jnp.float32),
                (c_pad - c, 1),
            ),
        ],
        axis=0,
    )
    sup_lo = cb_pad[:, 0:3].reshape(s_count, SUP, 3).min(axis=1)
    sup_hi = cb_pad[:, 3:6].reshape(s_count, SUP, 3).max(axis=1)
    sup_cb = jnp.concatenate([sup_lo, sup_hi], axis=1)  # (S, 6)
    sup_table = cb_pad.reshape(s_count, SUP * 6)  # per-super chunk bounds
    iota_s = jnp.arange(s_count, dtype=jnp.int32)
    iota_sup = jnp.arange(SUP, dtype=jnp.int32)

    def lex_gt(t_a, c_a, t_b, c_b):
        return (t_a > t_b) | ((t_a == t_b) & (c_a > c_b))

    def select(best_t, f_t, f_c, next_lb):
        """Each ray's k nearest unvisited chunks through the super level.

        `next_lb` (N, S) is each super's ADVANCING lower bound on its
        remaining eligible chunks' entry distance: initialized to the
        super-box slab entry and, once a super is examined, tightened to
        the min eligible chunk tn that survived the round (INF when
        consumed). Ranking + guard use it, so consumed-near supers rotate
        out of the gather slots instead of stalling the frontier — the
        failure mode of ranking by the static box entry."""
        keyed = jnp.where(next_lb < best_t[:, None], next_lb, _INF)  # (N, S)
        sup_sel, sup_t = [], []
        tn_sm = keyed
        for _j in range(KSUP):
            sidx = jnp.argmin(tn_sm, axis=1).astype(jnp.int32)
            sv = jnp.take_along_axis(tn_sm, sidx[:, None], axis=1)[:, 0]
            sup_sel.append(sidx)
            sup_t.append(sv)
            tn_sm = jnp.where(iota_s[None] == sidx[:, None], _INF, tn_sm)
        guard = jnp.min(tn_sm, axis=1)  # nearest un-gathered super's bound
        sup_sel = jnp.stack(sup_sel, 1)  # (N, KSUP)
        sup_ok = jnp.stack(sup_t, 1) < _INF

        glob = (sup_sel[:, :, None] * SUP + iota_sup[None, None, :]).reshape(
            n, KSUP * SUP
        )  # (N, G) global chunk ids (pad chunks give INF below)
        # fetch the examined supers' chunk bounds via a one-hot MXU lookup:
        # a per-ray row gather here runs at ~1-2 GiB/s and was measured as
        # ~90% of the round (utils/vec.py:small_table_lookup rationale)
        from ..utils.vec import small_table_lookup

        g_cb = small_table_lookup(
            sup_table, sup_sel.reshape(-1)
        ).reshape(n, KSUP * SUP, 6)
        inv = jnp.where(
            jnp.abs(d) < 1e-12, 1e12 * jnp.where(d < 0, -1.0, 1.0), 1.0 / d
        )
        t0 = (g_cb[:, :, 0:3] - o[:, None]) * inv[:, None]
        t1 = (g_cb[:, :, 3:6] - o[:, None]) * inv[:, None]
        tn_c = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf_c = jnp.min(jnp.maximum(t0, t1), axis=-1)
        ok = (tn_c <= tf_c) & (tf_c > 0.0) & (tn_c < best_t[:, None])
        tn_c = jnp.where(ok, tn_c, _INF)  # raw entry; see _slab_all
        elig = (
            (tn_c < _INF)
            & lex_gt(tn_c, glob, f_t[:, None], f_c[:, None])
            & jnp.repeat(sup_ok, SUP, axis=1)
        )
        tn_m = jnp.where(elig, tn_c, _INF)

        # k nearest by strict (t, chunk-id) lex order: argmin on t, then
        # the smallest global id among the tied entries
        sel_c, sel_t = [], []
        for _k in range(k):
            tmin = jnp.min(tn_m, axis=1)
            gmin = jnp.min(
                jnp.where(tn_m == tmin[:, None], glob, jnp.int32(2**30)), axis=1
            )
            pick = (tn_m == tmin[:, None]) & (glob == gmin[:, None])
            sel_c.append(jnp.where(tmin < _INF, gmin, -1))
            sel_t.append(tmin)
            tn_m = jnp.where(pick, _INF, tn_m)
        sel_c = jnp.stack(sel_c, 1)  # (N, K)
        sel_t = jnp.stack(sel_t, 1)

        # post-round frontier: lex-min of (k-th selection, guard), made
        # monotone against the incoming frontier.
        # STRICT lt < guard: an un-gathered chunk can share tn == guard
        # with a smaller id than the k-th pick — (guard, -1) keeps it
        # eligible (re-intersecting already-selected ties is idempotent)
        any_sel = sel_t < _INF
        lt = jnp.max(jnp.where(any_sel, sel_t, -_INF), axis=1)
        lc = jnp.max(
            jnp.where((sel_t == lt[:, None]) & any_sel, sel_c, -1), axis=1
        )
        has = jnp.any(any_sel, axis=1)
        cand_t = jnp.where(has & (lt < guard), lt, guard)
        cand_c = jnp.where(has & (lt < guard), lc, -1)
        adv = lex_gt(cand_t, cand_c, f_t, f_c)
        nf_t = jnp.where(adv, cand_t, f_t)
        nf_c = jnp.where(adv, cand_c, f_c)

        # tighten the examined supers' bounds: min chunk tn still eligible
        # AFTER this round's frontier (INF = consumed; eligibility only
        # shrinks, so the tightened bound stays valid forever)
        still = elig & lex_gt(tn_c, glob, nf_t[:, None], nf_c[:, None])
        rem_lb = jnp.min(
            jnp.where(still, tn_c, _INF).reshape(n, KSUP, SUP), axis=2
        )  # (N, KSUP)
        upd = (iota_s[None, None, :] == sup_sel[:, :, None]) & sup_ok[:, :, None]
        next_new = jnp.where(
            jnp.any(upd, axis=1),
            jnp.sum(jnp.where(upd, rem_lb[:, :, None], 0.0), axis=1),
            next_lb,
        )
        return sel_c, sel_t, nf_t, nf_c, next_new

    state = dict(
        best_t=best_t0,
        best_p=jnp.full((n,), -1.0),
        best_u=jnp.zeros((n,)),
        best_v=jnp.zeros((n,)),
        rounds=jnp.zeros((), jnp.int32),
        lb=_slab_all(o, d, sup_cb, jnp.full((n,), _INF)),  # (N, S)
    )
    (state["sel_c"], state["sel_t"], state["f_t"], state["f_c"],
     state["lb"]) = select(
        best_t0, jnp.full((n,), -_INF), jnp.full((n,), -1, jnp.int32),
        state["lb"],
    )

    def cond(st):
        return (st["rounds"] < rounds) & jnp.any(st["sel_c"] >= 0)

    def body(st):
        sel_c, sel_t = st["sel_c"], st["sel_t"]
        f_t, f_c = st["f_t"], st["f_c"]  # already post-round (see select)

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
        next_c, next_t, nf_t, nf_c, lb = select(new_best_t, f_t, f_c, st["lb"])
        return dict(
            best_t=new_best_t,
            best_p=jnp.where(better, rp, st["best_p"]),
            best_u=jnp.where(better, ru, st["best_u"]),
            best_v=jnp.where(better, rv, st["best_v"]),
            f_t=nf_t,
            f_c=nf_c,
            rounds=st["rounds"] + 1,
            sel_c=next_c,
            sel_t=next_t,
            lb=lb,
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
