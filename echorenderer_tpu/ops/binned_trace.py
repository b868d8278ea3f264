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
_INT_INF = 2**31 - 1  # key-space sentinel: empty candidate / consumed super
ROW = 128  # rays per kernel sub-row
SUP = 16  # chunks per superchunk (two-level selection)
KSUP = 4  # superchunks examined per ray per refill (full/bulk phases)
TAIL_KSUP = 8  # ... straggler phase (long rays span many supers)
TAIL_K = 32  # chunks intersected per straggler ray per round
CAND = 160  # per-ray candidate-buffer slots (>= TAIL_KSUP*SUP + TAIL_K - 1,
#             so a refill can never overflow the buffer: refills only fire
#             when fewer than `k` live entries remain)
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
    """Candidate-buffer traversal (v3). Each ray carries:

      * sup_ord (N, S): its supers sorted by box-entry distance, packed as
        monotone-f32-bits keys (read-only after setup) — the ray's entire
        traversal ORDER precomputed in one single-operand sort;
      * cursor: how many supers it has examined (monotone, exactly-once);
      * cand (N, CAND): packed (entry, chunk-id) keys of every eligible
        chunk of every examined super that has not been intersected yet.

    A round is: purge candidates the shrinking best_t has pruned; rays low
    on candidates examine their next KSUP supers (refill — slab test all
    their chunks, one-hot MXU bounds fetch); ONE single-operand row sort
    of (cand ++ new) yields the k nearest; pop them positionally, batch
    them through the chunk-major Pallas kernel, merge hits. No per-round
    super re-ranking, no advancing-frontier bookkeeping: exactly-once
    follows from the cursor and pop-by-removal (workload data,
    benchmarks/binned_workload.py: mean 7 eligible / 3.5 needed chunks
    per 1M-tri random ray — rounds must cost sorting + kernel, nothing
    else). Keys truncate entry-t mantissa bits to hold the id; truncation
    rounds t DOWN, so ordering/pruning stay conservative (never skips)."""
    n = o.shape[0]
    c = cb.shape[0]
    ign_f = ign_sorted.astype(jnp.float32)
    best_t0 = jnp.minimum(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), _INF
    )

    # ---- two-level tables (once per trace): supers of SUP consecutive
    # chunks (BVH-leaf order => spatially tight)
    s_count = -(-c // SUP)
    c_pad = s_count * SUP
    cbits = max(1, (c_pad - 1).bit_length())  # chunk id bits in a cand key
    sbits = max(1, (s_count - 1).bit_length())
    assert cbits <= 20, "chunk-key id field would leave <3 mantissa bits"
    cmask = (1 << cbits) - 1
    smask = (1 << sbits) - 1
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
    # slab test on every ray, so pad chunks are never selected
    cb_look = jnp.concatenate(
        [cb, jnp.full((c_pad - c, 6), _INF, jnp.float32)], axis=0
    )
    # block-diagonal lookup tables (one per refill width): ONE (N, ksup*S)
    # one-hot matmul fetches the examined supers' chunk bounds as six
    # (N, ksup*SUP) component-major arrays (minor-dim-6 layouts ran at ~5%
    # lane efficiency)
    def make_t_all(ksup):
        eye_k = jnp.eye(ksup, dtype=jnp.float32)
        return jnp.concatenate(
            [
                jnp.kron(eye_k, cb_look[:, comp].reshape(s_count, SUP))
                for comp in range(6)
            ],
            axis=1,
        )  # (ksup*S, 6*ksup*SUP)

    iota_s = jnp.arange(s_count, dtype=jnp.int32)
    iota_sup = jnp.arange(SUP, dtype=jnp.int32)

    def enc(t, ids, bits):
        """Monotone (t, id) packing: positive-f32 bits compare like ints,
        so clearing the low `bits` mantissa bits (rounds t DOWN —
        conservative) leaves room for the id as a tiebreak."""
        tb = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0), jnp.int32)
        key = (tb & ~jnp.int32((1 << bits) - 1)) | ids
        return jnp.where(t < _INF, key, _INT_INF)

    def dec_t(key, bits):
        f = jax.lax.bitcast_convert_type(
            key & ~jnp.int32((1 << bits) - 1), jnp.float32
        )
        return jnp.where(key == _INT_INF, _INF, f)

    def extract_sup(sup_ord_, pos):
        """sup_ord_[i, pos[i]] for each ray (mask-sum — per-ray element
        gathers are pathologically slow on TPU); _INT_INF past the end."""
        key = jnp.sum(
            jnp.where(iota_s[None] == pos[:, None], sup_ord_, 0), axis=1
        )
        return jnp.where(pos < s_count, key, _INT_INF)

    def refill(st, o_, d_, do_refill, ksup, t_all_k, sup_ord_):
        """Examine each refilling ray's next `ksup` supers: slab-test all
        their SUP chunks and return packed candidate keys for the eligible
        ones ((n, ksup*SUP), _INT_INF elsewhere), plus the advanced cursor
        and the next unexamined super's key."""
        n_ = o_.shape[0]
        cursor, best_t = st["cursor"], st["best_t"]
        sup_key = jnp.stack(
            [extract_sup(sup_ord_, cursor + j) for j in range(ksup)], axis=1
        )  # (n, ksup)
        sup_t = dec_t(sup_key, sbits)
        sup_ok = do_refill[:, None] & (sup_key != _INT_INF) & (
            sup_t < best_t[:, None]
        )
        sup_sel = jnp.where(sup_ok, sup_key & smask, 0)  # ids (0 if unused)
        glob = (sup_sel[:, :, None] * SUP + iota_sup[None, None, :]).reshape(
            n_, ksup * SUP
        )
        oh = jnp.concatenate(
            [
                jnp.where(
                    sup_ok[:, j : j + 1], iota_s[None] == sup_sel[:, j : j + 1],
                    False,
                ).astype(jnp.float32)
                for j in range(ksup)
            ],
            axis=1,
        )  # (n, ksup*S) one-hot rows
        g = jnp.dot(
            oh, t_all_k,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # exact (one-hot gather)
        )  # (n, 6G): [lo_x | lo_y | lo_z | hi_x | hi_y | hi_z] blocks
        gdim = ksup * SUP
        inv = _inv_dir(d_)
        tn_c = tf_c = None
        for a in range(3):
            t0 = (g[:, a * gdim : (a + 1) * gdim] - o_[:, a : a + 1]) * inv[:, a : a + 1]
            t1 = (g[:, (3 + a) * gdim : (4 + a) * gdim] - o_[:, a : a + 1]) * inv[:, a : a + 1]
            tn_a = jnp.minimum(t0, t1)
            tf_a = jnp.maximum(t0, t1)
            tn_c = tn_a if tn_c is None else jnp.maximum(tn_c, tn_a)
            tf_c = tf_a if tf_c is None else jnp.minimum(tf_c, tf_a)
        ok = (
            (tn_c <= tf_c) & (tf_c > 0.0) & (tn_c < best_t[:, None])
            & jnp.repeat(sup_ok, SUP, axis=1)
        )
        new_keys = enc(jnp.where(ok, tn_c, _INF), glob, cbits)
        adv = jnp.where(do_refill, jnp.int32(ksup), 0)
        new_cursor = cursor + adv
        next_sup = jnp.where(
            do_refill, extract_sup(sup_ord_, new_cursor), st["next_sup"]
        )
        return new_keys, new_cursor, next_sup

    def round_body(st, o_, d_, ign_f_, m_pad_, k_, ksup, t_all_k, sup_ord_):
        """One round: purge, refill-if-low, ONE row sort, pop k_, batch
        intersect, merge."""
        best_t = st["best_t"]
        cand = jnp.where(
            dec_t(st["cand"], cbits) < best_t[:, None], st["cand"], _INT_INF
        )
        n_live = jnp.sum((cand != _INT_INF).astype(jnp.int32), axis=1)
        next_t = dec_t(st["next_sup"], sbits)
        do_refill = (n_live < k_) & (next_t < best_t)
        new_keys, cursor, next_sup = refill(
            st, o_, d_, do_refill, ksup, t_all_k, sup_ord_
        )
        srt = jax.lax.sort(
            jnp.concatenate([cand, new_keys], axis=1), dimension=1
        )  # single-operand i32 sort; nearest chunks first
        pop = srt[:, :k_]
        new_cand = srt[:, k_ : k_ + CAND]
        valid = pop != _INT_INF  # purged => every live key beats best_t
        sel_c = jnp.where(valid, pop & cmask, -1).T  # (k, n)

        pt, pp, pu, pv = _pack_and_intersect(
            sel_c, o_, d_, best_t, ign_f_, prim_chunks,
            c, has_tri, has_sph, m_pad_,
        )
        hitp = pp >= 0.0
        ptv = jnp.where(hitp, pt, _INF)
        if occlude:
            blocked = jnp.any(hitp, axis=0)  # any hit < current cap
            new_t = jnp.where(blocked, 0.0, best_t)
            new_p, new_u, new_v = st["best_p"], st["best_u"], st["best_v"]
        else:
            rt = jnp.min(ptv, axis=0)
            rp = jnp.min(jnp.where(ptv == rt[None], pp, _INF), axis=0)
            match = (ptv == rt[None]) & (pp == rp[None])
            ru = jnp.max(jnp.where(match, pu, -_INF), axis=0)
            rv = jnp.max(jnp.where(match, pv, -_INF), axis=0)
            better = rt < best_t  # strict: an earlier equal hit stays
            new_t = jnp.where(better, rt, best_t)
            new_p = jnp.where(better, rp, st["best_p"])
            new_u = jnp.where(better, ru, st["best_u"])
            new_v = jnp.where(better, rv, st["best_v"])

        return dict(
            best_t=new_t, best_p=new_p, best_u=new_u, best_v=new_v,
            cand=new_cand, cursor=cursor, next_sup=next_sup,
            rounds=st["rounds"] + 1,
        )

    # ---- setup: per-ray super order, ONE single-operand sort
    sup_tn = _slab_all(o, d, sup_cb, best_t0)  # (N, S)
    sup_ord = jax.lax.sort(
        enc(sup_tn, jnp.broadcast_to(iota_s[None], sup_tn.shape), sbits),
        dimension=1,
    )
    state = dict(
        best_t=best_t0,
        best_p=jnp.full((n,), -1.0),
        best_u=jnp.zeros((n,)),
        best_v=jnp.zeros((n,)),
        cand=jnp.full((n, CAND), _INT_INF, jnp.int32),
        cursor=jnp.zeros((n,), jnp.int32),
        next_sup=sup_ord[:, 0],
        rounds=jnp.zeros((), jnp.int32),
    )

    t_all_full = make_t_all(KSUP)
    t_all_tail = make_t_all(TAIL_KSUP)
    m_pad_full = -(-(n * k) // 1024) * 1024
    nc = min(n, max(1024, (-(-(n // COMPACT_FRACTION) // 1024)) * 1024))
    full_rounds = max_rounds if nc >= n else FULL_ROUNDS

    def pend_mask(st):
        # pending = a live candidate below best_t remains, or an
        # unexamined super could still supply one
        live = jnp.any(dec_t(st["cand"], cbits) < st["best_t"][:, None], axis=1)
        return live | (dec_t(st["next_sup"], sbits) < st["best_t"])

    def pending(st):
        return jnp.any(pend_mask(st))

    st = jax.lax.while_loop(
        lambda st: (st["rounds"] < full_rounds) & pending(st),
        lambda st: round_body(
            st, o, d, ign_f, m_pad_full, k, KSUP, t_all_full, sup_ord
        ),
        state,
    )

    # ---- straggler compaction: gather the first nc still-pending rays
    # into a dense sub-problem with escalated pop/refill widths
    # (stragglers span many supers — workload p99: 53 eligible chunks),
    # scatter back, repeat. Two levels: a bounded bulk pass at n/8, then
    # a completion loop at n/32.
    def compact_phase(stf0, nc_, inner_cap, outer_cap, ks, ksup, t_all_k):
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
            sup_ord_s = sup_ord[idxs]
            sub = dict(
                # dead padding lanes get best_t 0: nothing is ever eligible
                best_t=jnp.where(live, stf["best_t"][idxs], 0.0),
                best_p=stf["best_p"][idxs],
                best_u=stf["best_u"][idxs], best_v=stf["best_v"][idxs],
                cand=stf["cand"][idxs],
                cursor=stf["cursor"][idxs],
                next_sup=stf["next_sup"][idxs],
                rounds=jnp.zeros((), jnp.int32),
            )
            done = jax.lax.while_loop(
                lambda s: (s["rounds"] < inner_cap) & jnp.any(pend_mask(s)),
                lambda s: round_body(
                    s, o_s, d_s, ign_s, m_pad_c, ks, ksup, t_all_k, sup_ord_s
                ),
                sub,
            )

            tgt = jnp.where(live, idxs, n)  # sentinel rows dropped
            out = dict(stf)
            for f in ("best_t", "best_p", "best_u", "best_v", "cand",
                      "cursor", "next_sup"):
                out[f] = stf[f].at[tgt].set(done[f], mode="drop")
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
        st = compact_phase(st, nc, 3, 2, k_straggler, KSUP, t_all_full)
        nc2 = min(n, max(1024, (-(-(n // 32) // 1024)) * 1024))
        st = compact_phase(
            st, nc2, max_rounds, (n // nc2 + 2) * 6, TAIL_K, TAIL_KSUP,
            t_all_tail,
        )

    if occlude:
        return (best_t0 > 0.0) & (st["best_t"] <= 0.0)
    return st["best_t"], st["best_p"], st["best_u"], st["best_v"]


# ---------------------------------------------------------------------------
# Public API (same contract as intersect_hier / occlude_hier)
# ---------------------------------------------------------------------------


def trace_binned(geom, soa: HierSoA, o, d, t_max, ignore, *,
                 rounds: int = 4096, k: int = 4, k_straggler: int = 8) -> Hit:
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
                   rounds: int = 4096, k: int = 4,
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
