"""Binned wavefront traversal: per-ray chunk selection + chunk-major
segment-row intersection (docs/TRAVERSAL_PLAN.md — the production design
for incoherent rays, replacing packet traversal on large scenes).

Every packet kernel makes ONE cull decision per 1024-ray block, which
collapses when bounce rays diverge (0.16 Mrays/s at 250k tris). Here each
ray culls independently and the *intersection* work is what gets batched:

1. Two-level selection: each ray ranks superchunks by an ADVANCING lower
   bound on their remaining eligible chunks, refines the top KSUP supers'
   chunk boxes (one-hot MXU lookup), and picks its K nearest not-yet
   visited chunks below its current best hit. A lexicographic
   (t_entry, chunk) frontier makes "visited" a two-scalar comparison.
2. The (ray, chunk) pairs are sorted chunk-major in ONE multi-operand
   `lax.sort` that carries the whole ray record as payload (measured
   ~5 ms for 1M pairs x 10 operands — vs ~70 ms for the elementwise
   gathers it replaces; see benchmarks/prim_costs.py).
3. Sorted pairs reshape DIRECTLY into 128-lane kernel rows — no holes, no
   dump rows, no searchsorted (which costs ~160 ms at 1M on TPU). A row
   spans one or more chunk SEGMENTS; the Pallas kernel walks each row's
   segments (scalar-prefetch table), DMA-ing each chunk once (cached
   across consecutive rows) and masking lanes to their own segment.
4. Results sort back by pair index (one 5-operand sort) and reduce
   per-ray as (K, N) — K on sublanes so the reduction is lane-parallel
   (the (N, 1)-shaped reductions of the previous design had pathological
   T(1,128) layouts).
5. Straggler compaction: after FULL_ROUNDS full-width rounds the
   still-pending rays (typically a small fraction) are gathered into a
   N/COMPACT_FRACTION-wide sub-problem that loops to completion, so late
   rounds cost a fraction of the full width.

The near-to-far rounds give per-ray early termination (the packet kernels
only get it packet-wide). Intersection math is the shared `_chunk_hits`
(identical findFar/ignore semantics and prim-id space as every other
path). Reference equivalent: the per-ray ordered stack traversal of
QuadBoundingVolumeHierarchy.cs:121-219.
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
ROW = 128  # rays per kernel sub-row
SUP = 16  # chunks per superchunk (two-level selection)
KSUP = 4  # superchunks refined per ray per round
FULL_ROUNDS = 1  # full-width rounds before straggler compaction
COMPACT_FRACTION = 8  # compact phase width = n / this


# ---------------------------------------------------------------------------
# Pallas segment-row kernel
# ---------------------------------------------------------------------------


def _seg_kernel(tbl_ref, ox, oy, oz, dx, dy, dz, tmax, ign, seg, prim_hbm,
                t_out, p_out, u_out, v_out, pscratch, cur, sem0, sem1,
                *, has_tri, has_sph, n_rows):
    """One block = 8 sub-rows of 128 chunk-sorted pairs. Sub-row r spans
    segments tbl[r] .. tbl[r] + tbl[n_rows + r] - 1; segment s intersects
    chunk tbl[2*n_rows + s] against the lanes whose seg column == s.

    Chunk streaming is double-buffered: while segment s computes out of
    one buffer, segment s+1's chunk is DMA'd into the other (the
    full-width rows were DMA-latency-bound at ~4 us/row single-buffered).
    `cur` tracks per buffer the chunk loaded-or-loading (-1 none) plus an
    in-flight flag, so a segment spanning consecutive rows reuses its
    resident chunk without a new copy."""
    i = pl.program_id(0)
    # defaults: dead rows / unmasked lanes report (t=tmax, no prim)
    t_out[:] = tmax[:]
    p_out[:] = jnp.full_like(tmax[:], -1.0)
    u_out[:] = jnp.zeros_like(tmax[:])
    v_out[:] = jnp.zeros_like(tmax[:])
    # cur[0:2] buffer chunk ids, cur[2:4] in-flight flags — persistent
    # across grid blocks (chunks stay resident block-to-block)
    @pl.when(i == 0)
    def _():
        cur[0] = -1
        cur[1] = -1
        cur[2] = 0
        cur[3] = 0

    def start(buf, c):
        @pl.when(buf == 0)
        def _():
            pltpu.make_async_copy(prim_hbm.at[c], pscratch.at[0], sem0).start()

        @pl.when(buf == 1)
        def _():
            pltpu.make_async_copy(prim_hbm.at[c], pscratch.at[1], sem1).start()

    def wait(buf):
        @pl.when((buf == 0) & (cur[2] == 1))
        def _():
            pltpu.make_async_copy(
                prim_hbm.at[cur[0]], pscratch.at[0], sem0
            ).wait()
            cur[2] = 0

        @pl.when((buf == 1) & (cur[3] == 1))
        def _():
            pltpu.make_async_copy(
                prim_hbm.at[cur[1]], pscratch.at[1], sem1
            ).wait()
            cur[3] = 0

    def prefetch(buf, c):
        """Begin loading chunk c into `buf` unless it's already there or
        the buffer still has an unconsumed copy in flight."""
        @pl.when(cur[buf] != c)
        def _():
            wait(buf)  # drop any stale in-flight copy
            start(buf, c)
            cur[buf] = c

            @pl.when(buf == 0)
            def _():
                cur[2] = 1

            @pl.when(buf == 1)
            def _():
                cur[3] = 1

    for s8 in range(8):
        r = i * 8 + s8
        alive = jnp.any(tmax[0, s8 : s8 + 1, :] > 0.0)

        @pl.when(alive)
        def _(s8=s8, r=r):
            row = lambda a: a[0, s8 : s8 + 1, :]
            sfirst = tbl_ref[r]
            scount = tbl_ref[n_rows + r]
            rox, roy, roz = row(ox), row(oy), row(oz)
            rdx, rdy, rdz = row(dx), row(dy), row(dz)
            rtm, rig, rsg = row(tmax), row(ign), row(seg)

            def seg_body(s, carry):
                bt, bp, bu, bv = carry
                c = tbl_ref[2 * n_rows + sfirst + s]
                # current buffer: the one already holding c, else alternate
                buf = jnp.where(
                    cur[0] == c, 0, jnp.where(cur[1] == c, 1, s % 2)
                )
                prefetch(buf, c)  # no-op when resident/in flight
                # queue the NEXT segment's chunk into the other buffer
                s_next = jnp.minimum(s + 1, scount - 1)
                c_next = tbl_ref[2 * n_rows + sfirst + s_next]
                pl.when((c_next != c) & (cur[1 - buf] != c_next))(
                    lambda: prefetch(1 - buf, c_next)
                )
                wait(buf)

                lanes = rsg == (sfirst + s).astype(jnp.float32)
                for sub in range(HCHUNK // 128):
                    blk = [
                        pscratch[buf, kq : kq + 1, sub * 128 : (sub + 1) * 128]
                        for kq in range(10)
                    ]
                    k_base = (c * HCHUNK + sub * 128).astype(jnp.float32)
                    t, u, v, pid = _chunk_hits(
                        blk, k_base, rox, roy, roz, rdx, rdy, rdz, rig,
                        has_tri, has_sph,
                    )
                    t = jnp.where(lanes, t, _INF)  # other segments' lanes
                    tm = jnp.min(t, axis=0, keepdims=True)
                    sel = t <= tm
                    pm = jnp.min(jnp.where(sel, pid, _INF), axis=0, keepdims=True)
                    sel2 = sel & (pid == pm)
                    um = jnp.sum(jnp.where(sel2, u, 0.0), axis=0, keepdims=True)
                    vm = jnp.sum(jnp.where(sel2, v, 0.0), axis=0, keepdims=True)
                    closer = tm < bt
                    bt = jnp.where(closer, tm, bt)
                    bp = jnp.where(closer, pm, bp)
                    bu = jnp.where(closer, um, bu)
                    bv = jnp.where(closer, vm, bv)
                return bt, bp, bu, bv

            init = (
                rtm,
                jnp.full_like(rtm, -1.0),
                jnp.zeros_like(rtm),
                jnp.zeros_like(rtm),
            )
            bt, bp, bu, bv = jax.lax.fori_loop(0, scount, seg_body, init)
            t_out[0, s8 : s8 + 1, :] = bt
            p_out[0, s8 : s8 + 1, :] = bp
            u_out[0, s8 : s8 + 1, :] = bu
            v_out[0, s8 : s8 + 1, :] = bv

    # drain any in-flight prefetch before the kernel retires
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        wait(0)
        wait(1)


def _run_rows(tbl, cols, prim_chunks, has_tri, has_sph):
    """cols: 9 arrays (R8, 8, 128) [o, d, tmax, ign, seg]; tbl the i32
    scalar table [sfirst (R,), scount (R,), seg_chunk]. Returns
    (t, p, u, v) of shape (R8, 8, 128)."""
    r8 = cols[0].shape[0]
    kernel = functools.partial(
        _seg_kernel, has_tri=has_tri, has_sph=has_sph, n_rows=r8 * 8
    )
    ray_spec = pl.BlockSpec(
        (1, 8, ROW), lambda i, tbl_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r8,),
        in_specs=[ray_spec] * 9 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ray_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, 16, HCHUNK), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
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
    )(tbl, *cols, prim_chunks)


# ---------------------------------------------------------------------------
# XLA driver: selection, packing, rounds
# ---------------------------------------------------------------------------


def _inv_dir(d):
    return jnp.where(jnp.abs(d) < 1e-12, 1e12 * jnp.where(d < 0, -1.0, 1.0), 1.0 / d)


def _slab_all(o, d, cb, limit):
    """(N, C) chunk entry distances; +INF where the ray misses the box or
    enters beyond `limit`. RAW entry distance (can be negative when the
    origin is inside the box): clamping to 0 made every origin-enclosing
    chunk tie at exactly 0.0 and the tie-safe frontier could never
    advance. Computed one axis at a time so every intermediate is a plain
    (N, C) array — (N, C, 3) shapes get a minor-dim-3 T(8,128) layout that
    runs at ~5% lane efficiency (profiled r3)."""
    inv = _inv_dir(d)
    tn = tf = None
    for a in range(3):
        t0 = (cb[None, :, a] - o[:, a : a + 1]) * inv[:, a : a + 1]
        t1 = (cb[None, :, 3 + a] - o[:, a : a + 1]) * inv[:, a : a + 1]
        tn_a = jnp.minimum(t0, t1)
        tf_a = jnp.maximum(t0, t1)
        tn = tn_a if tn is None else jnp.maximum(tn, tn_a)
        tf = tf_a if tf is None else jnp.minimum(tf, tf_a)
    ok = (tn <= tf) & (tf > 0.0) & (tn < limit[:, None])
    return jnp.where(ok, tn, _INF)


def _lex_gt(t_a, c_a, t_b, c_b):
    return (t_a > t_b) | ((t_a == t_b) & (c_a > c_b))


def _pack_and_intersect(sel_c, o, d, best_t, ign_f, prim_chunks,
                        n_chunks, has_tri, has_sph, m_pad):
    """Pack this round's (ray, chunk) pairs into chunk-sorted segment rows,
    run the row kernel, and return per-(k, ray) candidate results
    (t, prim, u, v) with prim == -1 where the pair found nothing."""
    kk, n = sel_c.shape
    m = kk * n
    pc = sel_c.reshape(-1)  # k-major: pair k*n + i = selection k of ray i
    valid = pc >= 0
    key = jnp.where(valid, pc, n_chunks).astype(jnp.int32)
    rep = lambda a: jnp.tile(a, (kk,))
    fields = (
        rep(o[:, 0]), rep(o[:, 1]), rep(o[:, 2]),
        rep(d[:, 0]), rep(d[:, 1]), rep(d[:, 2]),
        # invalid pairs carry tmax 0 -> their rows/lanes are dead
        jnp.where(valid, rep(best_t), 0.0),
        rep(ign_f),
    )
    pad = m_pad - m
    key = jnp.concatenate([key, jnp.full((pad,), n_chunks, jnp.int32)])
    fields = tuple(
        jnp.concatenate([f, jnp.zeros((pad,), f.dtype)]) for f in fields
    )
    q = jnp.arange(m_pad, dtype=jnp.int32)  # padding keeps q >= m

    srt = jax.lax.sort((key,) + fields + (q,), num_keys=1)
    key_s, fs, q_s = srt[0], srt[1:9], srt[9]

    # segment structure: one segment per distinct chunk value in the sorted
    # key sequence; rows are plain 128-lane slices of the sorted pairs
    iota = jnp.arange(m_pad, dtype=jnp.int32)
    flag = (iota == 0) | (key_s != jnp.roll(key_s, 1))
    seg_id = jnp.cumsum(flag.astype(jnp.int32)) - 1
    sfirst = seg_id[::ROW]
    scount = seg_id[ROW - 1 :: ROW] - sfirst + 1
    s_max = n_chunks + 2  # distinct keys <= chunks + invalid sentinel
    # segment -> chunk table via a tiny 2-operand sort (flagged entries
    # first, ordered by segment id) — scatter was ~3x the cost
    sc = jax.lax.sort(
        (jnp.where(flag, seg_id, jnp.int32(2**30)), key_s), num_keys=1
    )
    seg_chunk = jnp.minimum(sc[1][:s_max], n_chunks - 1)  # clamp sentinel
    tbl = jnp.concatenate([sfirst, scount, seg_chunk])

    shape3 = (m_pad // (8 * ROW), 8, ROW)
    cols = tuple(f.reshape(shape3) for f in fs) + (
        seg_id.astype(jnp.float32).reshape(shape3),
    )
    t_r, p_r, u_r, v_r = _run_rows(tbl, cols, prim_chunks, has_tri, has_sph)

    back = jax.lax.sort(
        (q_s, t_r.reshape(-1), p_r.reshape(-1), u_r.reshape(-1),
         v_r.reshape(-1)),
        num_keys=1,
    )
    return tuple(a[:m].reshape(kk, n) for a in back[1:5])


@functools.partial(
    jax.jit,
    static_argnames=("has_tri", "has_sph", "k", "k_straggler", "occlude",
                     "max_rounds"),
)
def _trace_binned_impl(o, d, t_max, ign_sorted, cb, prim_chunks,
                       has_tri, has_sph, k, k_straggler, occlude, max_rounds):
    n = o.shape[0]
    c = cb.shape[0]
    ign_f = ign_sorted.astype(jnp.float32)
    best_t0 = jnp.minimum(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), _INF
    )

    # ---- two-level chunk selection tables (computed once per trace):
    # supers of SUP consecutive chunks (BVH-leaf order => spatially tight)
    s_count = -(-c // SUP)
    c_pad = s_count * SUP
    cb_box = jnp.concatenate(  # ±INF pads: neutral for super min/max
        [
            cb,
            jnp.tile(
                jnp.asarray([[_INF, _INF, _INF, -_INF, -_INF, -_INF]], jnp.float32),
                (c_pad - c, 1),
            ),
        ],
        axis=0,
    )
    sup_lo = cb_box[:, 0:3].reshape(s_count, SUP, 3).min(axis=1)
    sup_hi = cb_box[:, 3:6].reshape(s_count, SUP, 3).max(axis=1)
    sup_cb = jnp.concatenate([sup_lo, sup_hi], axis=1)  # (S, 6)
    # lookup pads are (+INF, +INF): a degenerate box at infinity fails the
    # slab test on every ray, so pad chunks are never selected (±INF pads
    # make tn = -INF < tf = +INF — eligible with a frontier-hijacking -INF
    # entry distance)
    cb_look = jnp.concatenate(
        [cb, jnp.full((c_pad - c, 6), _INF, jnp.float32)], axis=0
    )
    # block-diagonal lookup table: ONE (N, KSUP*S) one-hot matmul fetches
    # all KSUP examined supers' chunk bounds as six (N, KSUP*SUP) arrays —
    # component-major, so no minor-dim-6 layouts anywhere (profiled r3:
    # the (N, 64, 6) form ran at ~5% lane efficiency, 23 ms/round)
    eye_k = jnp.eye(KSUP, dtype=jnp.float32)
    t_all = jnp.concatenate(
        [
            jnp.kron(eye_k, cb_look[:, comp].reshape(s_count, SUP))
            for comp in range(6)
        ],
        axis=1,
    )  # (KSUP*S, 6*KSUP*SUP)
    iota_s = jnp.arange(s_count, dtype=jnp.int32)
    iota_sup = jnp.arange(SUP, dtype=jnp.int32)
    iota_ks = jnp.arange(KSUP * s_count, dtype=jnp.int32)

    def select(best_t, f_t, f_c, next_lb, o_, d_, k_):
        """Each ray's k nearest unvisited chunks through the super level.

        `next_lb` (N', S) is each super's ADVANCING lower bound on its
        remaining eligible chunks' entry distance: initialized to the
        super-box slab entry and, once a super is examined, tightened to
        the min eligible chunk tn that survived the round (INF when
        consumed). Ranking + guard use it, so consumed-near supers rotate
        out of the gather slots instead of stalling the frontier — the
        failure mode of ranking by the static box entry."""
        n_ = o_.shape[0]
        keyed = jnp.where(next_lb < best_t[:, None], next_lb, _INF)  # (N', S)
        # rank supers with ONE stable row-sort (ties -> lowest index, same
        # as the argmin chain it replaces, which cost 4 full (N', S)
        # passes — 25 ms/call at 230k lanes in the wavefront profile)
        pad_s = max(KSUP + 1 - keyed.shape[1], 0)  # scenes with few supers
        if pad_s:
            keyed = jnp.pad(keyed, ((0, 0), (0, pad_s)), constant_values=_INF)
        iota_rows = jnp.broadcast_to(
            jnp.minimum(jnp.arange(keyed.shape[1], dtype=jnp.int32), s_count - 1)[None],
            keyed.shape,
        )
        kv, ki = jax.lax.sort((keyed, iota_rows), num_keys=1, dimension=1)
        sup_sel = ki[:, :KSUP].astype(jnp.int32)  # (N', KSUP)
        sup_t = kv[:, :KSUP]
        guard = kv[:, KSUP]
        sup_ok = sup_t < _INF

        glob = (sup_sel[:, :, None] * SUP + iota_sup[None, None, :]).reshape(
            n_, KSUP * SUP
        )  # (N', G) global chunk ids (pad chunks fail the slab test)
        # fetch the examined supers' chunk bounds via ONE one-hot matmul
        # against the block-diagonal component-major table: a per-ray row
        # gather runs at ~1-2 GiB/s, and the (N, G, 6) layout the old
        # per-super lookup produced ran at ~5% lane efficiency
        targ = sup_sel + iota_s.shape[0] * jnp.arange(KSUP, dtype=jnp.int32)[None]
        oh = jnp.zeros((n_, KSUP * s_count), jnp.float32)
        for j in range(KSUP):
            oh = oh + (iota_ks[None] == targ[:, j : j + 1]).astype(jnp.float32)
        g = jnp.dot(
            oh, t_all,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # exact (one-hot gather)
        )  # (N', 6G): [lo_x | lo_y | lo_z | hi_x | hi_y | hi_z] blocks
        gdim = KSUP * SUP
        inv = _inv_dir(d_)
        tn_c = tf_c = None
        for a in range(3):
            t0 = (g[:, a * gdim : (a + 1) * gdim] - o_[:, a : a + 1]) * inv[:, a : a + 1]
            t1 = (g[:, (3 + a) * gdim : (4 + a) * gdim] - o_[:, a : a + 1]) * inv[:, a : a + 1]
            tn_a = jnp.minimum(t0, t1)
            tf_a = jnp.maximum(t0, t1)
            tn_c = tn_a if tn_c is None else jnp.maximum(tn_c, tn_a)
            tf_c = tf_a if tf_c is None else jnp.minimum(tf_c, tf_a)
        ok = (tn_c <= tf_c) & (tf_c > 0.0) & (tn_c < best_t[:, None])
        tn_c = jnp.where(ok, tn_c, _INF)  # raw entry; see _slab_all
        elig = (
            (tn_c < _INF)
            & _lex_gt(tn_c, glob, f_t[:, None], f_c[:, None])
            & jnp.repeat(sup_ok, SUP, axis=1)
        )
        tn_m = jnp.where(elig, tn_c, _INF)

        # k nearest by strict (t, chunk-id) lex order: ONE two-key row
        # sort replaces the k-pass argmin/tie-break chain
        ts, gs = jax.lax.sort((tn_m, glob), num_keys=2, dimension=1)
        sel_t_n = ts[:, :k_]  # (N', k)
        sel_c_n = jnp.where(sel_t_n < _INF, gs[:, :k_], -1)
        sel_c = sel_c_n.T  # (k, N') — K on sublanes for reductions
        sel_t = sel_t_n.T

        # post-round frontier: lex-min of (k-th selection, guard), made
        # monotone against the incoming frontier.
        # STRICT lt < guard: an un-gathered chunk can share tn == guard
        # with a smaller id than the k-th pick — (guard, -1) keeps it
        # eligible (re-intersecting already-selected ties is idempotent)
        any_sel = sel_t < _INF
        lt = jnp.max(jnp.where(any_sel, sel_t, -_INF), axis=0)
        lc = jnp.max(
            jnp.where((sel_t == lt[None]) & any_sel, sel_c, -1), axis=0
        )
        has = jnp.any(any_sel, axis=0)
        cand_t = jnp.where(has & (lt < guard), lt, guard)
        cand_c = jnp.where(has & (lt < guard), lc, -1)
        adv = _lex_gt(cand_t, cand_c, f_t, f_c)
        nf_t = jnp.where(adv, cand_t, f_t)
        nf_c = jnp.where(adv, cand_c, f_c)

        # tighten the examined supers' bounds: min chunk tn still eligible
        # AFTER this round's frontier (INF = consumed; eligibility only
        # shrinks, so the tightened bound stays valid forever)
        still = elig & _lex_gt(tn_c, glob, nf_t[:, None], nf_c[:, None])
        rem_lb = jnp.min(
            jnp.where(still, tn_c, _INF).reshape(n_, KSUP, SUP), axis=2
        )  # (N', KSUP)
        upd = (iota_s[None, None, :] == sup_sel[:, :, None]) & sup_ok[:, :, None]
        next_new = jnp.where(
            jnp.any(upd, axis=1),
            jnp.sum(jnp.where(upd, rem_lb[:, :, None], 0.0), axis=1),
            next_lb,
        )
        return sel_c, sel_t, nf_t, nf_c, next_new

    def round_body(st, o_, d_, ign_f_, m_pad_, k_):
        """One traversal round at the state's width: SELECT each ray's k_
        nearest unvisited chunks, intersect them, merge. Selecting first
        means the state carries no pending selections — (best, frontier,
        lb) is always self-consistent, so phase handoffs and inner-round
        caps need no selection plumbing (and each call saves one
        full-width select vs the intersect-then-select ordering)."""
        sel_c, sel_t, nf_t, nf_c, lb = select(
            st["best_t"], st["f_t"], st["f_c"], st["lb"], o_, d_, k_
        )
        pt, pp, pu, pv = _pack_and_intersect(
            sel_c, o_, d_, st["best_t"], ign_f_, prim_chunks,
            c, has_tri, has_sph, m_pad_,
        )
        hitp = pp >= 0.0
        ptv = jnp.where(hitp, pt, _INF)
        if occlude:
            blocked = jnp.any(hitp, axis=0)  # any hit < current cap
            new_t = jnp.where(blocked, 0.0, st["best_t"])
            new_p, new_u, new_v = st["best_p"], st["best_u"], st["best_v"]
        else:
            rt = jnp.min(ptv, axis=0)
            rp = jnp.min(jnp.where(ptv == rt[None], pp, _INF), axis=0)
            match = (ptv == rt[None]) & (pp == rp[None])
            ru = jnp.max(jnp.where(match, pu, -_INF), axis=0)
            rv = jnp.max(jnp.where(match, pv, -_INF), axis=0)
            better = rt < st["best_t"]  # strict: an earlier equal hit stays
            new_t = jnp.where(better, rt, st["best_t"])
            new_p = jnp.where(better, rp, st["best_p"])
            new_u = jnp.where(better, ru, st["best_u"])
            new_v = jnp.where(better, rv, st["best_v"])

        return dict(
            best_t=new_t, best_p=new_p, best_u=new_u, best_v=new_v,
            f_t=nf_t, f_c=nf_c, lb=lb,
            rounds=st["rounds"] + 1,
        )

    # ---- initial state (full width); the first round selects from it
    lb0 = _slab_all(o, d, sup_cb, jnp.full((n,), _INF))  # (N, S)
    state = dict(
        best_t=best_t0,
        best_p=jnp.full((n,), -1.0),
        best_u=jnp.zeros((n,)),
        best_v=jnp.zeros((n,)),
        f_t=jnp.full((n,), -_INF),
        f_c=jnp.full((n,), -1, jnp.int32),
        lb=lb0,
        rounds=jnp.zeros((), jnp.int32),
    )

    m_pad_full = -(-(n * k) // 1024) * 1024
    nc = min(n, max(1024, (-(-(n // COMPACT_FRACTION) // 1024)) * 1024))
    full_rounds = max_rounds if nc >= n else FULL_ROUNDS

    def pend_mask(st):
        # pending = some super still holds chunks that could beat best_t
        # (lb rows tighten to INF as supers are consumed)
        return jnp.any(st["lb"] < st["best_t"][:, None], axis=1)

    def pending(st):
        return jnp.any(pend_mask(st))

    st = jax.lax.while_loop(
        lambda st: (st["rounds"] < full_rounds) & pending(st),
        lambda st: round_body(st, o, d, ign_f, m_pad_full, k),
        state,
    )

    # ---- straggler compaction: gather the first nc still-pending rays
    # into a dense sub-problem and run it with an ESCALATED K (stragglers
    # are long-frontier rays — misses grazing dozens of chunk boxes — so
    # fat rounds amortize the fixed per-round cost), scatter back, repeat.
    # Two levels: a bounded bulk pass at n/4, then a completion loop at
    # n/16 so the late rounds (a few percent of rays live) don't run at
    # quarter width (profiled r3: 11 x 10 ms compact rounds).
    def compact_phase(stf0, nc_, inner_cap, outer_cap):
        ks = k_straggler
        m_pad_c = -(-(nc_ * ks) // 1024) * 1024
        iota_n = jnp.arange(n, dtype=jnp.int32)
        iota_nc = jnp.arange(nc_, dtype=jnp.int32)

        def outer(stf):
            pend = pend_mask(stf)
            cnt = jnp.cumsum(pend.astype(jnp.int32))
            total = cnt[-1]
            pos = jnp.where(pend & (cnt <= nc_), cnt - 1, nc_)
            idxs = jnp.zeros((nc_,), jnp.int32).at[pos].set(iota_n, mode="drop")
            live = iota_nc < total  # duplicate-of-ray-0 padding lanes

            o_s, d_s, ign_s = o[idxs], d[idxs], ign_f[idxs]
            sub = dict(
                # dead padding lanes get best_t 0: nothing is ever eligible
                best_t=jnp.where(live, stf["best_t"][idxs], 0.0),
                best_p=stf["best_p"][idxs],
                best_u=stf["best_u"][idxs], best_v=stf["best_v"][idxs],
                f_t=stf["f_t"][idxs], f_c=stf["f_c"][idxs],
                lb=stf["lb"][idxs],
                rounds=jnp.zeros((), jnp.int32),
            )
            done = jax.lax.while_loop(
                lambda s: (s["rounds"] < inner_cap) & jnp.any(pend_mask(s)),
                lambda s: round_body(s, o_s, d_s, ign_s, m_pad_c, ks),
                sub,
            )

            tgt = jnp.where(live, idxs, n)  # sentinel rows dropped
            out = dict(stf)
            for f in ("best_t", "best_p", "best_u", "best_v", "f_t", "f_c"):
                out[f] = stf[f].at[tgt].set(done[f], mode="drop")
            out["lb"] = stf["lb"].at[tgt].set(done["lb"], mode="drop")
            out["outer"] = stf["outer"] + 1
            return out

        out = jax.lax.while_loop(
            lambda s: (s["outer"] < outer_cap) & pending(s),
            outer,
            {**stf0, "outer": jnp.zeros((), jnp.int32)},
        )
        out.pop("outer")
        return out

    if nc < n:
        st = compact_phase(st, nc, 3, 2)  # bulk stragglers, bounded
        nc2 = min(n, max(1024, (-(-(n // 32) // 1024)) * 1024))
        st = compact_phase(st, nc2, max_rounds, (n // nc2 + 2) * 6)

    if occlude:
        return (best_t0 > 0.0) & (st["best_t"] <= 0.0)
    return st["best_t"], st["best_p"], st["best_u"], st["best_v"]


# ---------------------------------------------------------------------------
# Public API (same contract as intersect_hier / occlude_hier)
# ---------------------------------------------------------------------------


def trace_binned(geom, soa: HierSoA, o, d, t_max, ignore, *,
                 rounds: int = 4096, k: int = 2, k_straggler: int = 8) -> Hit:
    """Closest-hit via binned traversal; same contract as intersect_hier
    (non-instanced scenes: Hit.prim in storage ids, findFar semantics).
    `rounds` is a safety cap — the loop normally runs until every ray's
    frontier is exhausted."""
    assert not soa.instanced, "binned traversal: instancing via scene_ops dispatch"
    n = o.shape[0]
    ign = _sorted_ignore(soa, ignore)
    t, p, u, v = _trace_binned_impl(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), ign,
        soa.chunk_bounds, soa.prim_chunks,
        soa.num_tris > 0, soa.num_prims > soa.num_tris, k, k_straggler,
        False, rounds,
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


def occlude_binned(geom, soa: HierSoA, o, d, t_max, ignore, *,
                   rounds: int = 4096, k: int = 2,
                   k_straggler: int = 8) -> jax.Array:
    """Any-hit within (EPS, t_max) via binned traversal; same contract as
    occlude_hier."""
    assert not soa.instanced, "binned traversal: instancing via scene_ops dispatch"
    n = o.shape[0]
    ign = _sorted_ignore(soa, ignore)
    return _trace_binned_impl(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), ign,
        soa.chunk_bounds, soa.prim_chunks,
        soa.num_tris > 0, soa.num_prims > soa.num_tris, k, k_straggler,
        True, rounds,
    )
