"""Binned wavefront traversal: per-ray chunk selection + chunk-major
segment-row intersection (docs/TRAVERSAL_PLAN.md — the production design
for incoherent rays, replacing packet traversal on large scenes).

Every packet kernel makes ONE cull decision per 1024-ray block, which
collapses when bounce rays diverge (0.16 Mrays/s at 250k tris). Here each
ray culls independently and the *intersection* work is what gets batched:

1. Two-level selection: each ray precomputes its ENTIRE super traversal
   order in one monotone-key sort, carries packed (entry_t, chunk)
   candidate keys across rounds, and pops the k nearest per round with a
   single row sort. Exactly-once follows from a monotone cursor into the
   precomputed order plus pop-by-removal.
2. The (ray, chunk) pairs are sorted chunk-major in ONE multi-operand
   `lax.sort` that carries the whole ray record as payload (measured
   ~5 ms for 1M pairs x 10 operands — vs ~70 ms for the elementwise
   gathers it replaces; see benchmarks/prim_costs.py).
3. Sorted pairs reshape DIRECTLY into 128-lane kernel rows — no holes, no
   dump rows, no searchsorted (which costs ~160 ms at 1M on TPU). A row
   spans one or more chunk SEGMENTS; the Pallas kernel walks each row's
   segments (scalar-prefetch table), DMA-ing each chunk once (cached
   across consecutive rows) and masking lanes to their own segment.
4. ROUNDS CARRY ONE PACKED i32 PER PAIR — f32 t bits with the low 8
   mantissa bits replaced by the prim-in-chunk index. The kernel's
   epilogue is a single i32 min, the unpack is a 2-operand sort (was 5),
   and the per-ray merge is a plain integer min. Exact (t, u, v, prim)
   are recovered ONCE at the end by re-intersecting each ray's winning
   chunk (profiled r3: the 5-op unpack + 4-reduction epilogue were ~40%
   of a round).
5. Straggler cascade: after FULL_ROUNDS full-width rounds the
   still-pending rays are gathered into progressively narrower
   sub-problems with escalated pop/refill widths; the last level loops
   to completion. The cascade shape is scale-dependent (profiled r3/r4):
   below ~256k rays every phase is dominated by the ~6 ms XLA-sort
   floor, so ONE fat tail wins; at 1M+ rays each round's sort/gather/
   kernel cost is WIDTH-bound (a dead pair still rides the sorts), so
   the r3 single fat tail (width n/16, k=32 = 2M-pair rounds repeated
   while ANY ray pends) was ~290 ms of the 462 ms trace — an
   intermediate n/4-wide bounded stage plus a narrow final loop cuts
   the width 8-64x while kernel work tracks live pairs only.

Conservative-rounding invariants: every packed key truncates t's low
mantissa bits to hold an id, which rounds t DOWN, so candidate ordering
and purging never skip a potential hit; the best-hit cap fed back into
kernels/purges is the truncation band's UPPER bound. Two hits whose t
differ by less than one band (2^-16 relative) may resolve to either —
the final re-intersection is exact for the winning chunk.

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
from .pallas_intersect import _EPS, _chunk_hits, _interpret

_INF = 3.4e38
_INT_INF = 2**31 - 1  # key-space sentinel: empty candidate / consumed super
_PBITS = 8  # prim-in-chunk bits in a result key (HCHUNK == 256)
ROW = 128  # rays per kernel sub-row
# chunks per superchunk (two-level selection). Import-time env knob for
# perf sweeps (benchmarks/binned_sweep.py runs subprocess legs): larger
# SUP shrinks the per-ray rank sort (S supers) but widens every refill
# (ksup*SUP candidate keys per examined super).
SUP = int(__import__("os").environ.get("ECHO_BT_SUP", "16"))
KSUP = 4  # superchunks examined per ray per refill (full-width phase)
TAIL_KSUP = 16  # ... straggler phase (long rays span many supers)
# selection/intersection granularity in prims: 0 = the pack's full chunk
# size (production). Halving to 128 was measured a NET LOSS at 1M random
# rays: needed half-chunks/ray ~6-7 vs 3.5 full chunks (pend after 2
# rounds 24.7% vs 8.9%), so pair-side costs grow ~1.6x while kernel
# arithmetic shrinks <1.3x. Kept as an env experiment knob.
HB_ENV = int(__import__("os").environ.get("ECHO_BT_HB", "0"))
FULL_ROUNDS = 2  # full-width rounds before straggler compaction
COMPACT_FRACTION = 16  # small-n: single tail width = n / this
# large-n cascade (n >= CASCADE_MIN): one bounded mid stage at width
# n/MID_FRACTION popping MID_K, then the final loop at width
# n/FINAL_FRACTION (r4 profile: the r3 fat tail alone was ~290 ms of a
# 462 ms 1M-ray trace)
CASCADE_MIN = 2 ** 18
MID_FRACTION = 8  # r4 stage profile: 8.9% of random rays pend after fr=2
MID_K = 16
MID_KSUP = 8
MID_ROUNDS = 1
FINAL_FRACTION = 128  # r4 sweep: 2.86 vs 2.65 Mrays/s at 64
# nearest supers stored per ray in the FULL-width phase order (capped:
# see extract_sups; compaction restarts store the full order). Workload
# r4: p90 eligible chunks 15 => examined supers rarely exceed ~16.
ORD_CAP = 32
# A/B oracles, read ONCE at import (reading os.environ inside a traced
# body bakes the first value into the jit cache — ADVICE r3 #1)
_ENV_SORTPOP = bool(__import__("os").environ.get("ECHO_BT_SORTPOP"))
_ENV_PACK10 = bool(__import__("os").environ.get("ECHO_BT_PACK10"))
# ECHO_BT_FUSED=0 restores the all-XLA round driver (A/B oracle for the
# fused Pallas select kernel, the r5 per-round-overhead fix)
_ENV_FUSED = __import__("os").environ.get("ECHO_BT_FUSED", "1") != "0"


# ---------------------------------------------------------------------------
# Pallas segment-row kernel
# ---------------------------------------------------------------------------


def _seg_kernel(tbl_ref, *args, has_tri, has_sph, n_rows, keyed,
                hchunk=HCHUNK, instanced=False, n_seg=0):
    """One block = 8 sub-rows of 128 chunk-sorted pairs. Sub-row r spans
    segments tbl[r] .. tbl[r] + tbl[n_rows + r] - 1; segment s intersects
    chunk tbl[2*n_rows + s] against the lanes whose seg column == s.

    keyed=True (the round kernel): one i32 output per pair — t's f32 bits
    with the low _PBITS replaced by the prim-in-chunk index (monotone in
    (truncated t, prim)), _INT_INF where nothing was found below tmax.
    keyed=False (the recovery kernel): exact (t, prim, u, v) per pair.

    instanced=True (TLAS scenes): a second f32 scalar-prefetch table
    carries per-instance world->local affines, tbl gains a per-segment
    instance row ([sfirst, scount, seg_chunk(n_seg), seg_inst(n_seg)]),
    rays carry a 10th ign_inst column, and each segment transforms the
    resident rays into its instance's space before _chunk_hits
    (unit_dir=False: |d_local| = 1/scale keeps t in WORLD units) — the
    same math as the packet walk's instance entry
    (pallas_hier.py, reference PreparedInstance.cs:47-61). A prim ignore
    only applies inside the ray's own instance.

    Chunk streaming is double-buffered: while segment s computes out of
    one buffer, segment s+1's chunk is DMA'd into the other (the
    full-width rows were DMA-latency-bound at ~4 us/row single-buffered).
    `cur` tracks per buffer the chunk loaded-or-loading (-1 none) plus an
    in-flight flag, so a segment spanning consecutive rows reuses its
    resident chunk without a new copy (instances sharing a pack share the
    copy too — chunk data is instance-independent)."""
    if instanced:
        instf_ref, ox, oy, oz, dx, dy, dz, tmax, ign, igninst, seg, \
            prim_hbm, *rest = args
    else:
        ox, oy, oz, dx, dy, dz, tmax, ign, seg, prim_hbm, *rest = args
        igninst = None
    if keyed:
        k_out, pscratch, cur, sem0, sem1 = rest
        k_out[:] = jnp.full_like(k_out[:], _INT_INF)
    else:
        t_out, p_out, u_out, v_out, pscratch, cur, sem0, sem1 = rest
        t_out[:] = tmax[:]
        p_out[:] = jnp.full_like(tmax[:], -1.0)
        u_out[:] = jnp.zeros_like(tmax[:])
        v_out[:] = jnp.zeros_like(tmax[:])
    i = pl.program_id(0)
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
            rii = row(igninst) if instanced else None

            def seg_env(s):
                """Segment-space rays + effective ignore: identity for
                plain scenes; the instance's world->local affine (scalar
                prefetch, like pallas_hier's instance entry) for TLAS."""
                if not instanced:
                    return rox, roy, roz, rdx, rdy, rdz, rig
                inst = tbl_ref[2 * n_rows + n_seg + sfirst + s]
                fb = inst * 12
                a = [instf_ref[fb + q] for q in range(9)]
                b3 = [instf_ref[fb + 9 + q] for q in range(3)]
                lox = a[0] * rox + a[1] * roy + a[2] * roz + b3[0]
                loy = a[3] * rox + a[4] * roy + a[5] * roz + b3[1]
                loz = a[6] * rox + a[7] * roy + a[8] * roz + b3[2]
                ldx = a[0] * rdx + a[1] * rdy + a[2] * rdz
                ldy = a[3] * rdx + a[4] * rdy + a[5] * rdz
                ldz = a[6] * rdx + a[7] * rdy + a[8] * rdz
                # a prim ignore only holds inside the ray's own instance
                ig_eff = jnp.where(
                    rii == inst.astype(jnp.float32), rig, -1.0
                )
                return lox, loy, loz, ldx, ldy, ldz, ig_eff

            def dma_chunk(s):
                """Resident-or-DMA chunk for segment s; prefetch s+1."""
                c = tbl_ref[2 * n_rows + sfirst + s]
                buf = jnp.where(
                    cur[0] == c, 0, jnp.where(cur[1] == c, 1, s % 2)
                )
                prefetch(buf, c)  # no-op when resident/in flight
                s_next = jnp.minimum(s + 1, scount - 1)
                c_next = tbl_ref[2 * n_rows + sfirst + s_next]
                pl.when((c_next != c) & (cur[1 - buf] != c_next))(
                    lambda: prefetch(1 - buf, c_next)
                )
                wait(buf)
                return c, buf

            def sub_blocks(buf):
                for sub in range(hchunk // 128):
                    blk = [
                        pscratch[buf, kq : kq + 1, sub * 128 : (sub + 1) * 128]
                        for kq in range(10)
                    ]
                    yield sub, blk

            if keyed:

                def seg_body(s, best):
                    c, buf = dma_chunk(s)
                    eox, eoy, eoz, edx, edy, edz, eig = seg_env(s)
                    lanes = rsg == (sfirst + s).astype(jnp.float32)
                    for sub, blk in sub_blocks(buf):
                        k_base = (c * hchunk + sub * 128).astype(jnp.float32)
                        t, _, _, _ = _chunk_hits(
                            blk, k_base, eox, eoy, eoz, edx, edy, edz, eig,
                            has_tri, has_sph, unit_dir=not instanced,
                        )
                        valid = lanes & (t < rtm) & (t < _INF)
                        tb = jax.lax.bitcast_convert_type(t, jnp.int32)
                        local = jax.lax.broadcasted_iota(
                            jnp.int32, t.shape, 0
                        ) + sub * 128
                        key = jnp.where(
                            valid,
                            (tb & jnp.int32(-(1 << _PBITS))) | local,
                            _INT_INF,
                        )
                        best = jnp.minimum(
                            best, jnp.min(key, axis=0, keepdims=True)
                        )
                    return best

                init = jnp.full((1, ROW), _INT_INF, jnp.int32)
                best = jax.lax.fori_loop(0, scount, seg_body, init)
                k_out[0, s8 : s8 + 1, :] = best
            else:

                def seg_body(s, carry):
                    bt, bp, bu, bv = carry
                    c, buf = dma_chunk(s)
                    eox, eoy, eoz, edx, edy, edz, eig = seg_env(s)
                    lanes = rsg == (sfirst + s).astype(jnp.float32)
                    for sub, blk in sub_blocks(buf):
                        k_base = (c * hchunk + sub * 128).astype(jnp.float32)
                        t, u, v, pid = _chunk_hits(
                            blk, k_base, eox, eoy, eoz, edx, edy, edz, eig,
                            has_tri, has_sph, unit_dir=not instanced,
                        )
                        t = jnp.where(lanes, t, _INF)
                        tm = jnp.min(t, axis=0, keepdims=True)
                        sel = t <= tm
                        pm = jnp.min(
                            jnp.where(sel, pid, _INF), axis=0, keepdims=True
                        )
                        sel2 = sel & (pid == pm)
                        um = jnp.sum(
                            jnp.where(sel2, u, 0.0), axis=0, keepdims=True
                        )
                        vm = jnp.sum(
                            jnp.where(sel2, v, 0.0), axis=0, keepdims=True
                        )
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


def _run_rows(tbl, cols, prim_chunks, has_tri, has_sph, keyed,
              inst_f32=None, n_seg=0):
    """cols: 9 arrays (R8, 8, 128) [o, d, tmax, ign, seg] — 10 with the
    ign_inst column for instanced scenes; tbl the i32 scalar table
    [sfirst (R,), scount (R,), seg_chunk(, seg_inst)]. `inst_f32` (the
    flat per-instance affine table) rides as a second scalar-prefetch
    operand when instanced. Returns the packed i32 key rows (keyed) or
    (t, p, u, v) f32 rows, shape (R8, 8, 128)."""
    r8 = cols[0].shape[0]
    hchunk = prim_chunks.shape[2]
    instanced = inst_f32 is not None
    kernel = functools.partial(
        _seg_kernel, has_tri=has_tri, has_sph=has_sph, n_rows=r8 * 8,
        keyed=keyed, hchunk=hchunk, instanced=instanced, n_seg=n_seg,
    )
    nsp = 2 if instanced else 1
    ray_spec = pl.BlockSpec(
        (1, 8, ROW), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    n_out = 1 if keyed else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(r8,),
        in_specs=[ray_spec] * len(cols) + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ray_spec] * n_out,
        scratch_shapes=[
            pltpu.VMEM((2, 16, hchunk), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    dt = jnp.int32 if keyed else jnp.float32
    out_shape = [jax.ShapeDtypeStruct((r8, 8, ROW), dt)] * n_out
    pf = (tbl, inst_f32) if instanced else (tbl,)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(*pf, *cols, prim_chunks)
    return out[0] if keyed else out


# ---------------------------------------------------------------------------
# Fused select kernel: purge + extract + merge + pop in ONE VMEM pass
# ---------------------------------------------------------------------------


def _select_kernel(cand_ref, nk_ref, bt_ref, dr_ref, cand_out, pop_out,
                   live_out, mink_out, *, w, k, cbits):
    """Per-round candidate-buffer maintenance for one 1024-ray block.
    The r4 XLA driver spent ~21 ms/round at 1M rays streaming the (n, W)
    buffer through ~20 separate fusions (purge read, live-count reduce,
    k-1 extract passes, merge, k pop passes, pend read); here the block
    lives in VMEM once and every pass is a W-long loop of (8, 128) tile
    ops (~2 ms/round measured in isolation).

    cand_ref/cand_out (1, w, 8, 128) i32, aliased: slot-major candidate
    keys, rays on the VPU tile. nk_ref (w-k+1, 1, 8, 128): this round's
    refill keys (slab-tested upstream against the same best_t). bt_ref
    (1, 8, 128) f32 best_t; dr_ref (1, 8, 128) i32 the refill flag
    (computed LAST round — see round_fused for why that is conservative).
    pop_out (k, 1, 8, 128): the k nearest keys, ascending, _INT_INF
    padded. live_out/mink_out (1, 8, 128) i32: post-pop live count and
    minimum remaining key (the driver recomputes refill/pend from these
    under the post-merge best_t, keeping termination exact)."""
    tmask = jnp.int32(-(1 << cbits))
    # purge in int key space: enc() clamps t at 0, and non-negative f32
    # bit patterns order like the floats, so
    # dec_t(key) < best_t  <=>  (key & tmask) < bitcast(best_t)
    best_bits = jax.lax.bitcast_convert_type(bt_ref[0], jnp.int32)
    refill = dr_ref[0] != 0
    inf_tile = jnp.full_like(best_bits, _INT_INF)

    # the buffer passes are fori_loops over the slot dim (cand_out doubles
    # as working scratch — it aliases cand_ref, so the purge pass reads
    # each slot exactly once before overwriting it); unrolling was
    # measured fine for the full phase (w=67, k=4) but the tail shape
    # (w=287, k=32) would trace ~40k ops
    def purge(j, _):
        v = cand_ref[0, j]
        cand_out[0, j] = jnp.where((v & tmask) < best_bits, v, _INT_INF)
        return 0

    jax.lax.fori_loop(0, w, purge, 0)

    def minscan():
        return jax.lax.fori_loop(
            0, w, lambda j, mn: jnp.minimum(mn, cand_out[0, j]), inf_tile
        )

    def remove(mn, gate):
        def body(j, _):
            v = cand_out[0, j]
            cand_out[0, j] = jnp.where(gate & (v == mn), _INT_INF, v)
            return 0

        jax.lax.fori_loop(0, w, body, 0)

    # extract the k-1 smallest live entries (a refilling ray holds < k of
    # them — the stale-refill invariant — so this captures ALL of them;
    # equality masking is safe because live keys are unique, see the
    # refill() invariant comment). Removal is gated on `refill`: rays that
    # keep their buffer must not lose entries (their ext values go unused).
    ext = []
    for _ in range(k - 1):
        mn = minscan()
        ext.append(mn)
        remove(mn, refill)
    # merge: refilling rays replace their buffer with [ext | new keys]
    for j in range(k - 1):
        cand_out[0, j] = jnp.where(refill, ext[j], cand_out[0, j])

    def merge_nk(j, _):
        cand_out[0, j] = jnp.where(
            refill, nk_ref[j - (k - 1), 0], cand_out[0, j]
        )
        return 0

    jax.lax.fori_loop(k - 1, w, merge_nk, 0)
    # pop the k nearest (ascending by construction)
    all_lanes = jnp.full_like(refill, True)
    for i in range(k):
        mn = minscan()
        pop_out[i, 0] = mn
        remove(mn, all_lanes)
    live, mink = jax.lax.fori_loop(
        0, w,
        lambda j, lm: (
            lm[0] + (cand_out[0, j] != _INT_INF).astype(jnp.int32),
            jnp.minimum(lm[1], cand_out[0, j]),
        ),
        (jnp.zeros_like(best_bits), inf_tile),
    )
    live_out[0] = live
    mink_out[0] = mink


def _run_select(cand, nk_t, best_t, do_refill, k, cbits):
    """cand (G, w, 8, 128) i32 (returned updated, aliased); nk_t
    (w-k+1, n) i32 slot-major refill keys; best_t (n,) f32; do_refill
    (n,) bool. Returns (cand', pop (k, n), live (n,) i32, mink (n,) i32)."""
    g, w = cand.shape[0], cand.shape[1]
    n = g * 1024
    rk = nk_t.shape[0]
    assert rk + k - 1 == w, (rk, k, w)
    nk4 = nk_t.reshape(rk, g, 8, 128)
    bt4 = best_t.reshape(g, 8, 128)
    dr4 = do_refill.astype(jnp.int32).reshape(g, 8, 128)
    kernel = functools.partial(_select_kernel, w=w, k=k, cbits=cbits)
    ray = lambda: pl.BlockSpec(
        (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, w, 8, 128), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rk, 1, 8, 128), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            ray(),
            ray(),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, w, 8, 128), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, 1, 8, 128), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            ray(),
            ray(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, w, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((k, g, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((g, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((g, 8, 128), jnp.int32),
        ],
        input_output_aliases={0: 0},
        interpret=_interpret(),
    )(cand, nk4, bt4, dr4)
    new_cand, pop, live, mink = out
    return new_cand, pop.reshape(k, n), live.reshape(n), mink.reshape(n)


# ---------------------------------------------------------------------------
# Fused setup kernel: super slab test + per-ray rank sort
# ---------------------------------------------------------------------------


def _setup_kernel(sup_ref, ox, oy, oz, dx, dy, dz, lim, out_ref, *,
                  s_count, s_pad, sbits):
    """One block = 1024 rays. For every super s: slab-test its bounds
    (sup_ref SMEM, component-major [lo_x(S) lo_y lo_z hi_x hi_y hi_z])
    against the ray block, encode (entry_t, s) as a monotone key (same
    formulas as _slab_all + enc), then bitonic-sort the s_pad keys —
    every compare-exchange is an elementwise i32 min/max between two
    (8, 128) rows, so the whole sort needs no cross-lane shuffles. The
    XLA pipeline this replaces (an (N, S) slab fusion feeding a row
    sort) round-trips ~20 (N, S)-sized intermediates through HBM; here
    everything lives in registers/VMEM."""
    z = ox[0]

    def inv(dc):
        return jnp.where(
            jnp.abs(dc) < 1e-12,
            1e12 * jnp.where(dc < 0, -1.0, 1.0),
            1.0 / dc,
        )

    o3 = (ox[0], oy[0], oz[0])
    i3 = (inv(dx[0]), inv(dy[0]), inv(dz[0]))
    limit = lim[0]
    keys = []
    for s in range(s_pad):
        if s >= s_count:
            keys.append(jnp.full_like(z, _INT_INF, dtype=jnp.int32))
            continue
        tn = tf = None
        for a in range(3):
            t0 = (sup_ref[a * s_pad + s] - o3[a]) * i3[a]
            t1 = (sup_ref[(3 + a) * s_pad + s] - o3[a]) * i3[a]
            tn_a = jnp.minimum(t0, t1)
            tf_a = jnp.maximum(t0, t1)
            tn = tn_a if tn is None else jnp.maximum(tn, tn_a)
            tf = tf_a if tf is None else jnp.minimum(tf, tf_a)
        ok = (tn <= tf) & (tf > 0.0) & (tn < limit)
        tb = jax.lax.bitcast_convert_type(jnp.maximum(tn, 0.0), jnp.int32)
        key = (tb & ~jnp.int32((1 << sbits) - 1)) | s
        keys.append(jnp.where(ok, key, _INT_INF))

    # bitonic ascending (keys unique below _INT_INF: id tiebreak in-key)
    k = 2
    while k <= s_pad:
        j = k // 2
        while j >= 1:
            for i in range(s_pad):
                l = i ^ j
                if l > i:
                    a, b = keys[i], keys[l]
                    mn = jnp.minimum(a, b)
                    mx = jnp.maximum(a, b)
                    if (i & k) == 0:
                        keys[i], keys[l] = mn, mx
                    else:
                        keys[i], keys[l] = mx, mn
            j //= 2
        k *= 2

    cap = min(len(keys), out_ref.shape[0])
    for s in range(cap):
        out_ref[s, 0] = keys[s]


def _setup_rank(o, d, sup_cb, limit, sbits, cap=None):
    """(min(S_pad, cap), N) per-ray ascending super keys via the fused
    Pallas kernel; pow2-padded rows are _INT_INF. `cap` keeps only each
    ray's `cap` NEAREST supers (the bitonic still runs full-width in
    VMEM; only the HBM write shrinks — profiled r4: the (256, 1M) i32
    order was 1 GB, read whole by every refill). Callers using a capped
    order MUST handle cursor overflow conservatively (see extract_sup).
    Falls back to None when the super table is too wide for a
    VMEM-resident sort."""
    import os

    s_count = sup_cb.shape[0]
    s_pad = max(8, 1 << (s_count - 1).bit_length())
    s_out = s_pad if cap is None else min(s_pad, cap)
    n = o.shape[0]
    if s_pad > 512 or n % 1024 or os.environ.get("ECHO_BT_XLA_SETUP"):
        return None
    g = n // 1024
    shape3 = (g, 8, 128)
    cols = tuple(o[:, a].reshape(shape3) for a in range(3)) + tuple(
        d[:, a].reshape(shape3) for a in range(3)
    ) + (jnp.broadcast_to(limit, (n,)).reshape(shape3),)
    # component-major SMEM row: [lo_x(S_pad) lo_y lo_z hi_x hi_y hi_z];
    # pads get +INF lo (slab always fails)
    pad = jnp.full((s_pad - s_count, 6), _INF, jnp.float32)
    supp = jnp.concatenate([sup_cb, pad], axis=0)  # (s_pad, 6)
    sup_flat = jnp.concatenate([supp[:, c] for c in range(6)])

    kernel = functools.partial(
        _setup_kernel, s_count=s_count, s_pad=s_pad, sbits=sbits
    )
    ray_spec = pl.BlockSpec(
        (1, 8, 128), lambda i, sup_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[ray_spec] * 7,
            out_specs=pl.BlockSpec(
                (s_out, 1, 8, 128),
                lambda i, sup_: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((s_out, g, 8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=_interpret(),
    )(sup_flat, *cols)
    return out.reshape(s_out, n)


# ---------------------------------------------------------------------------
# XLA driver: selection, packing, rounds
# ---------------------------------------------------------------------------


def _inv_dir(d):
    return jnp.where(jnp.abs(d) < 1e-12, 1e12 * jnp.where(d < 0, -1.0, 1.0), 1.0 / d)


def _half_view(prim_chunks, hb):
    """(C*splits, 16, hb) view of the shared (C, 16, HCHUNK) hier pack:
    each chunk split into HCHUNK/hb consecutive prim runs. Global sorted
    prim ids are unchanged (half h covers prims h*hb .. h*hb+hb-1), so
    keys/recovery/ignore semantics are identical — only the kernel's
    per-pair arithmetic and the selection granularity shrink (r4: the row
    kernel was ~37 ms/round at 256-prim chunks, VPU-bound)."""
    C, rows, H = prim_chunks.shape
    splits = H // hb
    if splits <= 1:
        return prim_chunks
    return prim_chunks.reshape(C, rows, splits, hb).transpose(
        0, 2, 1, 3
    ).reshape(C * splits, rows, hb)


def _half_bounds(prim_chunks, hb):
    """(C*splits, 6) AABBs of each hb-prim half-chunk, computed on device
    from the pack itself (the host builder only stores full-chunk
    bounds; ~0.5 ms at 1M tris). Padded prims (v0 == 1e30, e=0) are
    masked so a half holding only padding gets an empty (+INF,-INF) box
    — without the mask its +1e30 corners would make it eligible for
    every ray."""
    C, _, H = prim_chunks.shape
    splits = H // hb
    sph = prim_chunks[:, 9]
    is_s = sph > 0.5
    padded = prim_chunks[:, 0] >= 1e29
    r = prim_chunks[:, 3]  # sphere radius rides the bx row
    lo, hi = [], []
    for a in range(3):
        av = prim_chunks[:, a]
        bv = prim_chunks[:, 3 + a]
        cv = prim_chunks[:, 6 + a]
        lo_t = jnp.minimum(av, jnp.minimum(av + bv, av + cv))
        hi_t = jnp.maximum(av, jnp.maximum(av + bv, av + cv))
        lo_a = jnp.where(padded, _INF, jnp.where(is_s, av - r, lo_t))
        hi_a = jnp.where(padded, -_INF, jnp.where(is_s, av + r, hi_t))
        lo.append(lo_a.reshape(C * splits, hb).min(axis=1))
        hi.append(hi_a.reshape(C * splits, hb).max(axis=1))
    return jnp.stack(lo + hi, axis=1)


def _f32_table() -> bool:
    """ECHO_BT_F32TBL=1 restores the exact-f32 HIGHEST-precision bounds
    table (A/B oracle for the conservative-bf16 production path)."""
    import os

    return os.environ.get("ECHO_BT_F32TBL", "") == "1"


def _bf16_round(x, *, up: bool):
    """Directed f32 -> bf16 rounding (result returned as f32 values that
    are exactly representable in bf16): `up=False` rounds toward -inf,
    `up=True` toward +inf, both saturating at the largest FINITE bf16 so
    a 0-weight lane of the one-hot matmul never multiplies an infinity
    (0 * inf = NaN would poison the gather)."""
    bits = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32), jnp.int32)
    low = bits & jnp.int32(0xFFFF)
    trunc = bits & jnp.int32(~0xFFFF)  # toward zero (sign-magnitude)
    away = trunc + jnp.int32(0x10000)  # away from zero
    inexact = low != 0
    neg = bits < 0
    # round down: negatives move away from zero; round up: positives do
    grow = inexact & (~neg if up else neg)
    out = jnp.where(grow, away, trunc)
    # saturate magnitude to bf16 max (0x7F7F0000 = 3.3895e38)
    mag = out & jnp.int32(0x7FFFFFFF)
    capped = jnp.where(
        mag > jnp.int32(0x7F7F0000),
        (out & jnp.int32(-0x80000000)) | jnp.int32(0x7F7F0000),
        out,
    )
    return jax.lax.bitcast_convert_type(capped, jnp.float32)


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
                        n_chunks, has_tri, has_sph, m_pad, keyed=True,
                        inst=None):
    """Pack this round's (ray, chunk) pairs into chunk-sorted segment rows,
    run the row kernel, and return per-(k, ray) results: the packed i32
    key (keyed, _INT_INF where nothing found) or exact (t, prim, u, v).

    `inst` (TLAS scenes) = dict(g2c, g2i, inst_f32, ign_inst): selection
    keys are GLOBAL virtual chunks; the segment table maps them to (local
    pack chunk, instance) and the kernel applies the instance affine per
    segment (see _seg_kernel)."""
    kk, n = sel_c.shape
    if inst is not None:
        assert not _ENV_PACK10, "ECHO_BT_PACK10 oracle: non-instanced only"
    m = kk * n
    pc = sel_c.reshape(-1)  # k-major: pair k*n + i = selection k of ray i
    valid = pc >= 0
    key = jnp.where(valid, pc, n_chunks).astype(jnp.int32)
    pad = m_pad - m
    key = jnp.concatenate([key, jnp.full((pad,), n_chunks, jnp.int32)])
    q = jnp.arange(m_pad, dtype=jnp.int32)  # padding keeps q >= m

    if _ENV_PACK10:
        # A/B oracle: carry all 8 ray fields through the sort (10 operands)
        rep = lambda a: jnp.tile(a, (kk,))
        fields = (
            rep(o[:, 0]), rep(o[:, 1]), rep(o[:, 2]),
            rep(d[:, 0]), rep(d[:, 1]), rep(d[:, 2]),
            # invalid pairs carry tmax 0 -> their rows/lanes are dead
            jnp.where(valid, rep(best_t), 0.0),
            rep(ign_f),
        )
        fields = tuple(
            jnp.concatenate([f, jnp.zeros((pad,), f.dtype)]) for f in fields
        )
        srt = jax.lax.sort((key,) + fields + (q,), num_keys=1)
        key_s, fs, q_s = srt[0], srt[1:9], srt[9]
    else:
        # production: sort ONLY (chunk key, pair id) and fetch the 8 ray
        # fields afterwards as ONE 8-float row gather from a per-ray record
        # table — the sort moves 8 B/pair instead of 40 B/pair across its
        # O(log m) passes (the 10-op sort's extra operands dominated round
        # cost at multi-M pair counts). tmax is re-masked from the sorted
        # key: invalid pairs and padding both carry key == n_chunks.
        srt = jax.lax.sort((key, q), num_keys=1)
        key_s, q_s = srt
        rec_rows = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                    best_t, ign_f]
        if inst is not None:
            rec_rows.append(inst["ign_inst"].astype(jnp.float32))
        # the row gather is TPU-gather-element-rate bound (~21 ms at 4.2M
        # pairs x 8 f32). Measured alternatives (benchmarks/
        # gather_variants.py): 8 column takes 415 ms, complex64 packing
        # 49 ms, a flat-array slice gather lowers SERIALLY (~20 s), and a
        # row-major layout constraint on the table changes nothing — the
        # (m, 8) take IS the fastest known form.
        rec = jnp.stack(rec_rows, axis=1)  # (n, 8|9) per-ray record rows
        ray_id = q_s % n  # pairs are k-major; padding maps to SOME ray
        g = jnp.take(rec, ray_id, axis=0)  # (m_pad, 8|9) row gather
        live_pair = key_s < n_chunks
        fs = tuple(g[:, j] for j in range(6)) + (
            jnp.where(live_pair, g[:, 6], 0.0),  # dead pairs: tmax 0
            # dead pairs also get a never-matching ignore so padding lanes
            # stay inert even if the kernel grows a use of ign outside the
            # t<tmax gate (ADVICE r3 #3)
            jnp.where(live_pair, g[:, 7], -2.0),
        )
        if inst is not None:
            fs = fs + (jnp.where(live_pair, g[:, 8], -2.0),)

    # segment structure: one segment per distinct chunk value in the sorted
    # key sequence; rows are plain 128-lane slices of the sorted pairs
    iota = jnp.arange(m_pad, dtype=jnp.int32)
    flag = (iota == 0) | (key_s != jnp.roll(key_s, 1))
    seg_id = jnp.cumsum(flag.astype(jnp.int32)) - 1
    sfirst = seg_id[::ROW]
    scount = seg_id[ROW - 1 :: ROW] - sfirst + 1
    s_max = n_chunks + 2  # distinct keys <= chunks + invalid sentinel
    # segment -> chunk table: seg_id is sorted ascending, so segment s's
    # first pair sits at searchsorted(seg_id, s) — a binary search (~22
    # tiny gathers) replaces the full-width 2-operand sort that used to
    # build this table (~8 ms/round at 4.2M pairs, r5 xprof). Absent
    # segments (s > last) return m_pad; the position clamp keeps the
    # key gather in range and the sentinel clamp keeps the chunk id in
    # range — such segments have no live lanes (tmax is masked to 0).
    first_pos = jnp.searchsorted(
        seg_id, jnp.arange(s_max, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    seg_g = jnp.minimum(
        key_s[jnp.minimum(first_pos, m_pad - 1)], n_chunks - 1
    )
    if inst is not None:
        # global virtual chunk -> (local pack chunk for DMA, instance for
        # the affine); small s_max-sized gathers
        seg_chunk = jnp.take(inst["g2c"], seg_g)
        seg_inst = jnp.take(inst["g2i"], seg_g)
        tbl = jnp.concatenate([sfirst, scount, seg_chunk, seg_inst])
    else:
        tbl = jnp.concatenate([sfirst, scount, seg_g])

    shape3 = (m_pad // (8 * ROW), 8, ROW)
    cols = tuple(f.reshape(shape3) for f in fs) + (
        seg_id.astype(jnp.float32).reshape(shape3),
    )
    res = _run_rows(
        tbl, cols, prim_chunks, has_tri, has_sph, keyed,
        inst_f32=None if inst is None else inst["inst_f32"],
        n_seg=s_max,
    )

    if keyed:  # 2-operand unpack (was 5): the whole result is one i32
        back = jax.lax.sort((q_s, res.reshape(-1)), num_keys=1)
        return back[1][:m].reshape(kk, n)
    t_r, p_r, u_r, v_r = res
    back = jax.lax.sort(
        (q_s, t_r.reshape(-1), p_r.reshape(-1), u_r.reshape(-1),
         v_r.reshape(-1)),
        num_keys=1,
    )
    return tuple(a[:m].reshape(kk, n) for a in back[1:5])


def _prim_hits_rows(rows, pid_f, o, d, ignore_f, has_tri, has_sph,
                    unit_dir=True):
    """Re-evaluate ONE prim per ray from its 10 gathered pack floats —
    the same formulas as _chunk_hits (Möller-Trumbore / sphere quadratic,
    findFar for ignored spheres), on (n,) vectors in XLA instead of
    (prims, rays) blocks in Mosaic. Used by the exact-recovery step: the
    winning key already names the prim, so recovery is a row gather plus
    this, not a chunk-wide kernel pass. Returns (t, ok, u, v)."""
    ax, ay, az, bx, by, bz, cx, cy, cz, sph = rows
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ignored = pid_f == ignore_f

    t_tri = u = v = None
    if has_tri:
        px = dy * cz - dz * cy
        py = dz * cx - dx * cz
        pz = dx * cy - dy * cx
        det = bx * px + by * py + bz * pz
        inv = jnp.where(
            jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0
        )
        sx = ox - ax
        sy = oy - ay
        sz = oz - az
        u = (sx * px + sy * py + sz * pz) * inv
        qx = sy * bz - sz * by
        qy = sz * bx - sx * bz
        qz = sx * by - sy * bx
        v = (dx * qx + dy * qy + dz * qz) * inv
        t_tri = (cx * qx + cy * qy + cz * qz) * inv
        tri_ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t_tri > _EPS) & ~ignored
        )
    if has_sph:
        fx = ox - ax
        fy = oy - ay
        fz = oz - az
        bq = fx * dx + fy * dy + fz * dz
        cq = fx * fx + fy * fy + fz * fz - bx * bx
        if unit_dir:
            disc = bq * bq - cq
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_near = -bq - sq
            t_far = -bq + sq
        else:
            # instanced rays carry |d| = 1/scale: full quadratic keeps t
            # the WORLD parameter (same as _chunk_hits unit_dir=False)
            aq = dx * dx + dy * dy + dz * dz
            disc = bq * bq - aq * cq
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = 1.0 / aq
            t_near = (-bq - sq) * inv_a
            t_far = (-bq + sq) * inv_a
        t_sph = jnp.where(ignored, t_far, jnp.where(t_near > _EPS, t_near, t_far))
        sph_ok = (disc >= 0.0) & (t_sph > _EPS)

    if has_tri and has_sph:
        is_sph = sph > 0.5
        t = jnp.where(is_sph, t_sph, t_tri)
        ok = jnp.where(is_sph, sph_ok, tri_ok)
    elif has_tri:
        t, ok = t_tri, tri_ok
    else:
        t, ok = t_sph, sph_ok
    if u is None:
        u = jnp.zeros_like(t)
        v = jnp.zeros_like(t)
    return t, ok, u, v


def _key_ub(key):
    """Upper bound of a packed key's truncation band: the smallest f32
    provably >= the exact t the key was packed from (truncation rounds
    down). Feeding this back as the pruning/kernel cap keeps conservative
    semantics — never skips a chunk that could hold a closer hit."""
    band = (key & jnp.int32(-(1 << _PBITS))) + jnp.int32(1 << _PBITS)
    f = jax.lax.bitcast_convert_type(band, jnp.float32)
    return jnp.where(key == _INT_INF, _INF, f)


@functools.partial(
    jax.jit,
    static_argnames=("has_tri", "has_sph", "k", "k_straggler", "occlude",
                     "max_rounds", "full_rounds", "compact_fraction",
                     "ksup", "tail_ksup", "stop_after"),
)
def _trace_binned_impl(o, d, t_max, ign_sorted, cb, prim_chunks,
                       has_tri, has_sph, k, k_straggler, occlude, max_rounds,
                       full_rounds=None, compact_fraction=None, ksup=None,
                       tail_ksup=None, stop_after=None,
                       g2c=None, g2i=None, inst_f32=None, ign_inst=None):
    """Candidate-buffer traversal (v4). Each ray carries:

      * sup_ord (N, S): its supers sorted by box-entry distance, packed as
        monotone-f32-bits keys (read-only after setup) — the ray's entire
        traversal ORDER precomputed in one single-operand sort;
      * cursor: how many supers it has examined (monotone, exactly-once);
      * cand (N, W): packed (entry, chunk-id) keys of every eligible
        chunk of every examined super that has not been intersected yet.
        W is phase-specific (refill width + pop width - 1: a refill only
        fires when fewer than `k` live entries remain, so the buffer can
        never overflow) — the tail phase pads the buffer wider.

    A round is: purge candidates the shrinking best cap has pruned; rays
    low on candidates examine their next KSUP supers (refill — slab test
    all their chunks, one-hot MXU bounds fetch); ONE single-operand row
    sort of (cand ++ new) yields the k nearest; pop them positionally,
    batch them through the chunk-major Pallas kernel (keyed: one packed
    i32 per pair), merge by integer min. No per-round super re-ranking,
    no advancing-frontier bookkeeping (workload data,
    benchmarks/binned_workload.py: mean 7 eligible / 3.5 needed chunks
    per 1M-tri random ray — rounds must cost sorting + kernel, nothing
    else). All keys truncate t's mantissa to hold an id; truncation
    rounds t DOWN and caps use the band's upper bound (_key_ub), so
    ordering/pruning stay conservative (never skip). Exact (t, u, v,
    prim) come from ONE final re-intersection of each ray's winning
    chunk."""
    n = o.shape[0]
    instanced = g2c is not None
    # optional finer selection granularity (ECHO_BT_HB — measured a net
    # loss at 128, see the knob comment); production uses the pack's own
    # chunk size with the host-built bounds. Instanced scenes: `cb` is
    # the per-GLOBAL-chunk world AABB table (HierSoA.binned_wcb) and
    # splitting is unsupported (g2c maps whole pack chunks).
    hb = HB_ENV if 0 < HB_ENV < prim_chunks.shape[2] else prim_chunks.shape[2]
    if hb < prim_chunks.shape[2] and not instanced:
        pc_half = _half_view(prim_chunks, hb)
        cb = _half_bounds(prim_chunks, hb)
    else:
        hb = prim_chunks.shape[2]
        pc_half = prim_chunks
    c = cb.shape[0]
    ii_f = ign_inst.astype(jnp.float32) if instanced else None
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
    # one-hot lookup table: row s = super s's SUP chunk bounds laid out
    # component-major [lo_x(SUP) lo_y lo_z hi_x hi_y hi_z] (minor-dim-6
    # layouts ran at ~5% lane efficiency). The refill fetches each
    # examined super with its own (N, S) x (S, 6*SUP) matmul — the r3
    # block-diagonal kron variant cost ksup x the flops for the same
    # gather (100 GFLOP/round at ksup=4; 98 in the ksup=16 tail)
    base_tbl = jnp.concatenate(
        [cb_look[:, comp].reshape(s_count, SUP) for comp in range(6)],
        axis=1,
    )  # (S, 6*SUP)
    if not _f32_table():
        # conservative bf16 table: lo components round DOWN, hi round UP,
        # so every box only widens — slab eligibility stays conservative
        # (never skips a chunk) and the one-hot gather is EXACT in a
        # plain bf16 MXU matmul (0/1 weights, values already bf16). This
        # replaces the Precision.HIGHEST f32 matmul (6-pass emulation,
        # ~40% of refill cost in benchmarks/binned_pieces.py).
        base_tbl = jnp.concatenate(
            [
                _bf16_round(base_tbl[:, : 3 * SUP], up=False),
                _bf16_round(base_tbl[:, 3 * SUP :], up=True),
            ],
            axis=1,
        ).astype(jnp.bfloat16)

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

    def extract_sups(sup_ord_, pos, count):
        """Keys at positions pos..pos+count-1 of each ray's stored order
        (mask-sum over ONE fused read — per-ray element gathers are
        pathologically slow on TPU, and the r3 per-position extracts each
        re-read the whole (n, W) order from HBM). Returns count
        (key, overflow) pairs.

        CAPPED orders (W < s_count, the full-width phase): a position at
        or past W returns the LAST stored key's value with overflow=True —
        its t is a conservative LOWER bound for every unexamined super
        (the order is ascending), so the pending gate keeps the ray alive
        and it flows to a compaction stage whose restart builds an
        uncapped order; admission is blocked (overflow) so no chunk is
        ever enqueued twice."""
        w_ord = sup_ord_.shape[1]
        capped = w_ord < s_count
        iota_w = jnp.arange(w_ord, dtype=jnp.int32)
        rel = iota_w[None] - pos[:, None]  # (n, W)
        outs = [
            jnp.sum(jnp.where(rel == j, sup_ord_, 0), axis=1)
            for j in range(count)
        ]
        res = []
        for j, kj in enumerate(outs):
            pj = pos + j
            if capped:
                last = sup_ord_[:, w_ord - 1]
                ovf = pj >= w_ord
                res.append((jnp.where(ovf, last, kj), ovf))
            else:
                kj = jnp.where(pj < w_ord, kj, _INT_INF)
                res.append((kj, jnp.zeros(pj.shape, bool)))
        return res

    def refill(st, o_, d_, do_refill, ksup, sup_ord_):
        """Examine each refilling ray's next `ksup` supers: slab-test all
        their SUP chunks and return packed candidate keys for the eligible
        ones ((n, ksup*SUP), _INT_INF elsewhere), plus the advanced cursor
        and the next unexamined super's key. One (N, S) x (S, 6*SUP)
        one-hot matmul per examined super fetches its chunk bounds."""
        cursor, best_t = st["cursor"], st["best_t"]
        inv = _inv_dir(d_)
        # ksup refill positions + the post-advance next_sup peek, all from
        # one fused read of the order
        ext = extract_sups(sup_ord_, cursor, ksup + 1)
        keys = []
        for j in range(ksup):
            sup_key, ovf = ext[j]
            sup_t = dec_t(sup_key, sbits)
            sup_ok = do_refill & ~ovf & (sup_key != _INT_INF) & (sup_t < best_t)
            sup_sel = jnp.where(sup_ok, sup_key & smask, 0)  # id (0 unused)
            glob = sup_sel[:, None] * SUP + iota_sup[None, :]  # (n, SUP)
            oh = jnp.where(
                sup_ok[:, None], iota_s[None] == sup_sel[:, None], False
            ).astype(base_tbl.dtype)  # (n, S)
            # one-hot gather: exact at any precision for the bf16 table
            # (0/1 weights, values already bf16); the f32 A/B table needs
            # the HIGHEST (6-pass) product to keep all 24 mantissa bits
            g = jnp.dot(
                oh, base_tbl,
                preferred_element_type=jnp.float32,
                precision=(
                    jax.lax.Precision.HIGHEST
                    if base_tbl.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                ),
            )  # (n, 6*SUP): [lo_x | lo_y | lo_z | hi_x | hi_y | hi_z]
            tn_c = tf_c = None
            for a in range(3):
                t0 = (g[:, a * SUP : (a + 1) * SUP] - o_[:, a : a + 1]) * inv[:, a : a + 1]
                t1 = (g[:, (3 + a) * SUP : (4 + a) * SUP] - o_[:, a : a + 1]) * inv[:, a : a + 1]
                tn_a = jnp.minimum(t0, t1)
                tf_a = jnp.maximum(t0, t1)
                tn_c = tn_a if tn_c is None else jnp.maximum(tn_c, tn_a)
                tf_c = tf_a if tf_c is None else jnp.minimum(tf_c, tf_a)
            ok = (
                (tn_c <= tf_c) & (tf_c > 0.0) & (tn_c < best_t[:, None])
                & sup_ok[:, None]
            )
            keys.append(enc(jnp.where(ok, tn_c, _INF), glob, cbits))
        # INVARIANT (the sortless pop depends on it): every live key in a
        # ray's buffer is UNIQUE — the chunk id rides the low bits, each
        # chunk belongs to exactly one super, and the monotone cursor
        # examines each super at most once per phase, so a chunk can be
        # enqueued at most once. Re-admitting a chunk mid-phase would make
        # the pop's equality masking drop candidates silently (ADVICE r3
        # #2); phase restarts (the compaction stages) are safe because
        # they reset the whole buffer and merge by idempotent integer min.
        new_keys = jnp.concatenate(keys, axis=1)  # (n, ksup*SUP)
        adv = jnp.where(do_refill, jnp.int32(ksup), 0)
        new_cursor = cursor + adv
        if sup_ord_.shape[1] < s_count:  # capped: cursor parks at the cap
            new_cursor = jnp.minimum(new_cursor, sup_ord_.shape[1])
        next_sup = jnp.where(do_refill, ext[ksup][0], st["next_sup"])
        return new_keys, new_cursor, next_sup

    def refill_T(st, o_, d_, do_refill, ksup, sup_ord_):
        """Transposed refill: identical semantics to `refill`, but the new
        candidate keys come out SLOT-MAJOR as (ksup*SUP, n) — the fused
        select kernel's natural layout — with the one-hot bounds gather
        computed as (6*SUP, S) x (S, n) so no (n, X) -> (X, n) transpose
        ever materializes in HBM."""
        cursor, best_t = st["cursor"], st["best_t"]
        inv = _inv_dir(d_)
        ext = extract_sups(sup_ord_, cursor, ksup + 1)
        base_T = base_tbl.T  # constant-folded once per trace
        keys = []
        for j in range(ksup):
            sup_key, ovf = ext[j]
            sup_t = dec_t(sup_key, sbits)
            sup_ok = do_refill & ~ovf & (sup_key != _INT_INF) & (sup_t < best_t)
            sup_sel = jnp.where(sup_ok, sup_key & smask, 0)
            glob = sup_sel[None, :] * SUP + iota_sup[:, None]  # (SUP, n)
            oh = jnp.where(
                sup_ok[None, :], iota_s[:, None] == sup_sel[None, :], False
            ).astype(base_tbl.dtype)  # (S, n)
            gT = jnp.dot(
                base_T, oh,
                preferred_element_type=jnp.float32,
                precision=(
                    jax.lax.Precision.HIGHEST
                    if base_tbl.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                ),
            )  # (6*SUP, n)
            tn_c = tf_c = None
            for a in range(3):
                t0 = (gT[a * SUP : (a + 1) * SUP] - o_[:, a][None, :]) * inv[:, a][None, :]
                t1 = (gT[(3 + a) * SUP : (4 + a) * SUP] - o_[:, a][None, :]) * inv[:, a][None, :]
                tn_a = jnp.minimum(t0, t1)
                tf_a = jnp.maximum(t0, t1)
                tn_c = tn_a if tn_c is None else jnp.maximum(tn_c, tn_a)
                tf_c = tf_a if tf_c is None else jnp.minimum(tf_c, tf_a)
            ok = (
                (tn_c <= tf_c) & (tf_c > 0.0) & (tn_c < best_t[None, :])
                & sup_ok[None, :]
            )
            keys.append(enc(jnp.where(ok, tn_c, _INF), glob, cbits))
        new_keys = jnp.concatenate(keys, axis=0)  # (ksup*SUP, n)
        adv = jnp.where(do_refill, jnp.int32(ksup), 0)
        new_cursor = cursor + adv
        if sup_ord_.shape[1] < s_count:
            new_cursor = jnp.minimum(new_cursor, sup_ord_.shape[1])
        next_sup = jnp.where(do_refill, ext[ksup][0], st["next_sup"])
        return new_keys, new_cursor, next_sup

    def round_fused(st, o_, d_, ign_f_, ii_, m_pad_, k_, w_, ksup,
                    sup_ord_):
        """Fused-engine round (ECHO_BT_FUSED, the default): the refill
        decision is the PREVIOUS round's — stale by one round, which is
        conservative both ways: purges are monotone, so a flagged ray
        still holds < k_ live entries at merge time (the extract
        invariant), and a ray that newly drops below k_ mid-round just
        pops what it has and refills next round. The staleness is what
        lets purge+extract+merge+pop run as ONE Pallas VMEM pass
        (_select_kernel) instead of ~20 XLA HBM passes. Termination stays
        exact: pend/refill are recomputed here from the kernel's live
        count and minimum remaining key under the POST-merge best_t."""
        best_t = st["best_t"]
        new_keys, cursor, next_sup = refill_T(
            st, o_, d_, st["do_refill"], ksup, sup_ord_
        )
        new_cand, pop, live, mink = _run_select(
            st["cand"], new_keys, best_t, st["do_refill"], k_, cbits
        )
        valid = pop != _INT_INF  # purged => every live key beats best_t
        sel_c = jnp.where(valid, pop & cmask, -1)  # (k, n), already k-major

        pk = _pack_and_intersect(
            sel_c, o_, d_, best_t, ign_f_, pc_half,
            c, has_tri, has_sph, m_pad_, keyed=True,
            inst=None if not instanced else dict(
                g2c=g2c, g2i=g2i, inst_f32=inst_f32, ign_inst=ii_),
        )  # (k, n) i32
        if occlude:
            blocked = jnp.any(pk != _INT_INF, axis=0)
            new_t = jnp.where(blocked, 0.0, best_t)
            new_key, new_chunk = st["best_key"], st["best_chunk"]
        else:
            kmin = jnp.min(pk, axis=0)
            cwin = jnp.min(
                jnp.where(pk == kmin[None], sel_c, jnp.int32(2**30)), axis=0
            )
            better = kmin < st["best_key"]
            new_key = jnp.where(better, kmin, st["best_key"])
            new_chunk = jnp.where(better, cwin, st["best_chunk"])
            new_t = jnp.minimum(
                jnp.where(better, _key_ub(kmin), best_t), best_t
            )
        next_t = dec_t(next_sup, sbits)
        dr = (live < k_) & (next_t < new_t)
        pend = (dec_t(mink, cbits) < new_t) | (next_t < new_t)
        return dict(
            best_t=new_t, best_key=new_key, best_chunk=new_chunk,
            cand=new_cand, cursor=cursor, next_sup=next_sup,
            do_refill=dr, pend=pend, rounds=st["rounds"] + 1,
        )

    def round_body(st, o_, d_, ign_f_, ii_, m_pad_, k_, w_, ksup,
                   sup_ord_):
        """One round: purge, refill-if-low, ONE row sort, pop k_, batch
        intersect (keyed), merge by integer min. w_ = candidate-buffer
        width this phase."""
        best_t = st["best_t"]
        cand = jnp.where(
            dec_t(st["cand"], cbits) < best_t[:, None], st["cand"], _INT_INF
        )
        n_live = jnp.sum((cand != _INT_INF).astype(jnp.int32), axis=1)
        next_t = dec_t(st["next_sup"], sbits)
        do_refill = (n_live < k_) & (next_t < best_t)
        new_keys, cursor, next_sup = refill(
            st, o_, d_, do_refill, ksup, sup_ord_
        )
        if _ENV_SORTPOP:
            # A/B oracle: full (w_ + R)-wide row sort, positional pop
            srt = jax.lax.sort(
                jnp.concatenate([cand, new_keys], axis=1), dimension=1
            )  # single-operand i32 sort; nearest chunks first
            pop = srt[:, :k_]
            new_cand = srt[:, k_ : k_ + w_]
        else:
            # production: sortless pop. The buffer is UNSORTED — pop-k is
            # k reduce-min+mask passes and the refill merge exploits the
            # trigger invariant (a refilling ray has < k_ live entries):
            # extract its k_-1 smallest and prepend them to the fresh
            # block, which is exactly width w_ again. ~6x fewer VPU ops
            # than the (w_+R)-wide bitonic row sort it replaces; the
            # popped/kept multisets are identical (keys unique below
            # _INT_INF: chunk id in the low bits, each chunk belongs to
            # one super and supers are examined once).
            ext = []
            tmp = cand
            for _ in range(k_ - 1):
                mn = jnp.min(tmp, axis=1)
                ext.append(mn)
                tmp = jnp.where(tmp == mn[:, None], _INT_INF, tmp)
            merged = (
                jnp.concatenate([jnp.stack(ext, 1), new_keys], axis=1)
                if ext else new_keys
            )  # (n, w_)
            cand2 = jnp.where(do_refill[:, None], merged, cand)
            pops = []
            for _ in range(k_):
                mn = jnp.min(cand2, axis=1)
                pops.append(mn)
                cand2 = jnp.where(cand2 == mn[:, None], _INT_INF, cand2)
            pop = jnp.stack(pops, 1)  # ascending, _INT_INF-padded
            new_cand = cand2
        valid = pop != _INT_INF  # purged => every live key beats best_t
        sel_c = jnp.where(valid, pop & cmask, -1).T  # (k, n)

        pk = _pack_and_intersect(
            sel_c, o_, d_, best_t, ign_f_, pc_half,
            c, has_tri, has_sph, m_pad_, keyed=True,
            inst=None if not instanced else dict(
                g2c=g2c, g2i=g2i, inst_f32=inst_f32, ign_inst=ii_),
        )  # (k, n) i32
        if occlude:
            blocked = jnp.any(pk != _INT_INF, axis=0)
            new_t = jnp.where(blocked, 0.0, best_t)
            new_key, new_chunk = st["best_key"], st["best_chunk"]
        else:
            kmin = jnp.min(pk, axis=0)
            cwin = jnp.min(
                jnp.where(pk == kmin[None], sel_c, jnp.int32(2**30)), axis=0
            )
            better = kmin < st["best_key"]
            new_key = jnp.where(better, kmin, st["best_key"])
            new_chunk = jnp.where(better, cwin, st["best_chunk"])
            new_t = jnp.minimum(
                jnp.where(better, _key_ub(kmin), best_t), best_t
            )

        return dict(
            best_t=new_t, best_key=new_key, best_chunk=new_chunk,
            cand=new_cand, cursor=cursor, next_sup=next_sup,
            rounds=st["rounds"] + 1,
        )

    # phase shape knobs: call-site overrides for perf sweeps; module
    # constants are the tuned production defaults
    ksup = KSUP if ksup is None else ksup
    tail_ksup = TAIL_KSUP if tail_ksup is None else tail_ksup
    compact_fraction = (
        COMPACT_FRACTION if compact_fraction is None else compact_fraction
    )
    nc = min(n, max(1024, (-(-(n // compact_fraction) // 1024)) * 1024))
    # fused Pallas select engine: needs 1024-multiple widths (the kernel's
    # ray blocks); the SORTPOP A/B oracle exercises the XLA driver only
    use_fused = _ENV_FUSED and (n % 1024 == 0) and not _ENV_SORTPOP

    # ---- setup: per-ray super order — the fused Pallas slab+rank kernel
    # when it applies (pow2 super pad <= 512, 1024-multiple rays), else
    # an (N, S) slab fusion + ONE single-operand row sort. When a
    # compaction stage exists (nc < n) the full-width phase stores only
    # each ray's ORD_CAP nearest supers (8x less HBM on setup writes and
    # every refill read at 1M tris); overflow rays park conservatively
    # and finish in a compaction stage, whose restart builds an uncapped
    # order. Without a rescue stage the order must stay uncapped.
    ord_t = _setup_rank(
        o, d, sup_cb, best_t0, sbits, cap=ORD_CAP if nc < n else None
    )
    if ord_t is not None:
        sup_ord = ord_t.T  # (n, s_out); pad columns hold _INT_INF
    else:
        sup_tn = _slab_all(o, d, sup_cb, best_t0)  # (N, S)
        sup_ord = jax.lax.sort(
            enc(sup_tn, jnp.broadcast_to(iota_s[None], sup_tn.shape), sbits),
            dimension=1,
        )
    w_full = ksup * SUP + k - 1
    state = dict(
        best_t=best_t0,
        best_key=jnp.full((n,), _INT_INF, jnp.int32),
        best_chunk=jnp.full((n,), -1, jnp.int32),
        cursor=jnp.zeros((n,), jnp.int32),
        next_sup=sup_ord[:, 0],
        rounds=jnp.zeros((), jnp.int32),
    )
    if use_fused:
        pend0 = dec_t(sup_ord[:, 0], sbits) < best_t0
        state.update(
            cand=jnp.full((n // 1024, w_full, 8, 128), _INT_INF, jnp.int32),
            do_refill=pend0, pend=pend0,
        )
    else:
        state.update(cand=jnp.full((n, w_full), _INT_INF, jnp.int32))
    rb = round_fused if use_fused else round_body

    m_pad_full = -(-(n * k) // 1024) * 1024
    if full_rounds is None:
        full_rounds = FULL_ROUNDS
    if nc >= n:
        full_rounds = max_rounds

    def pend_mask(st):
        # pending = a live candidate below the cap remains, or an
        # unexamined super could still supply one
        live = jnp.any(dec_t(st["cand"], cbits) < st["best_t"][:, None], axis=1)
        return live | (dec_t(st["next_sup"], sbits) < st["best_t"])

    def pend_vec(st):
        """Per-ray pending flag: carried directly by the fused engine
        (recomputed each round under the post-merge best_t), derived from
        the candidate buffer by the XLA engine."""
        return st["pend"] if use_fused else pend_mask(st)

    def pending(st):
        return jnp.any(pend_vec(st))

    st = jax.lax.while_loop(
        lambda st: (st["rounds"] < full_rounds) & pending(st),
        lambda st: rb(
            st, o, d, ign_f, ii_f, m_pad_full, k, w_full, ksup, sup_ord
        ),
        state,
    )

    def _stop(stx):
        """Profiling-only early return (stop_after static knob): INCOMPLETE
        results — best-so-far t plus the live pending count in [1]."""
        pendc = jnp.sum(pend_vec(stx).astype(jnp.float32))
        z = jnp.zeros_like(stx["best_t"])
        return stx["best_t"], z + pendc, z, z

    if stop_after == "setup":
        return _stop(state)
    if stop_after == "full":
        return _stop(st)

    # ---- straggler cascade. Each stage gathers the first `width`
    # still-pending rays into a dense sub-problem with escalated pop and
    # refill widths (stragglers span many supers — workload p99: 53
    # eligible chunks). The sub-problem RESTARTS each ray: a fresh Pallas
    # setup on the gathered rays re-ranks their supers under their
    # CURRENT best_t cap (far tighter than the launch cap once a hit
    # exists), which is cheaper than gathering the full phase's (w, S)
    # super order and (w, W) candidate buffer and scattering them back.
    # The restart may re-admit chunks an earlier phase already
    # intersected; the integer-min merge is idempotent, so the only cost
    # is a bounded re-intersection. A `retired` flag (not the stale
    # candidate buffer) records completion — a processed ray's stale
    # buffer stays conservative (it can only OVERestimate pending work:
    # purges are monotone and popped entries were intersected), so an
    # unfinished ray flows into the next stage with its tighter best_t.
    #
    # Stage shapes are scale-dependent (module docstring point 5): one
    # bounded mid-width stage at n >= CASCADE_MIN, then a narrow final
    # stage that loops while anything pends.
    iota_n = jnp.arange(n, dtype=jnp.int32)

    def compact_phase(stf, width, ks, ksup_t, bounded):
        """Gather the first `width` pending rays, solve with pop width
        `ks` / refill width `ksup_t`; `bounded` caps the inner rounds
        (None = run to completion). Returns the updated full-width state
        with per-ray `retired` set only where the sub-run finished."""
        w_sub = ksup_t * SUP + ks - 1
        m_pad_c = -(-(width * ks) // 1024) * 1024
        iota_w = jnp.arange(width, dtype=jnp.int32)

        pend = pend_vec(stf) & ~stf["retired"]
        cnt = jnp.cumsum(pend.astype(jnp.int32))
        total = cnt[-1]
        pos = jnp.where(pend & (cnt <= width), cnt - 1, width)
        idxs = jnp.zeros((width,), jnp.int32).at[pos].set(iota_n, mode="drop")
        live = iota_w < total  # duplicate-of-ray-0 padding lanes

        o_s, d_s, ign_s = o[idxs], d[idxs], ign_f[idxs]
        ii_s = ii_f[idxs] if instanced else None
        # dead padding lanes get best_t 0: nothing is ever eligible
        best_s = jnp.where(live, stf["best_t"][idxs], 0.0)
        ord_s = _setup_rank(o_s, d_s, sup_cb, best_s, sbits)
        if ord_s is not None:
            sup_ord_s = ord_s.T
        else:
            tn_s = _slab_all(o_s, d_s, sup_cb, best_s)
            sup_ord_s = jax.lax.sort(
                enc(tn_s, jnp.broadcast_to(iota_s[None], tn_s.shape), sbits),
                dimension=1,
            )
        sub = dict(
            best_t=best_s,
            best_key=stf["best_key"][idxs],
            best_chunk=stf["best_chunk"][idxs],
            cursor=jnp.zeros((width,), jnp.int32),
            next_sup=sup_ord_s[:, 0],
            rounds=jnp.zeros((), jnp.int32),
        )
        if use_fused:
            pend0s = dec_t(sup_ord_s[:, 0], sbits) < best_s
            sub.update(
                cand=jnp.full(
                    (width // 1024, w_sub, 8, 128), _INT_INF, jnp.int32
                ),
                do_refill=pend0s, pend=pend0s,
            )
        else:
            sub.update(cand=jnp.full((width, w_sub), _INT_INF, jnp.int32))
        cap = max_rounds if bounded is None else bounded
        done = jax.lax.while_loop(
            lambda s: (s["rounds"] < cap) & jnp.any(pend_vec(s)),
            lambda s: rb(
                s, o_s, d_s, ign_s, ii_s, m_pad_c, ks, w_sub, ksup_t,
                sup_ord_s
            ),
            sub,
        )

        finished = live & ~pend_vec(done)
        tgt = jnp.where(live, idxs, n)  # sentinel rows dropped
        out = dict(stf)
        for f in ("best_t", "best_key", "best_chunk"):
            out[f] = stf[f].at[tgt].set(done[f], mode="drop")
        out["retired"] = stf["retired"].at[
            jnp.where(finished, idxs, n)
        ].set(True, mode="drop")
        return out

    if nc < n:
        st = {**st, "retired": jnp.zeros((n,), bool)}
        if n >= CASCADE_MIN:
            mid_w = -(-(n // MID_FRACTION) // 1024) * 1024
            # cond: a fully-coherent wave (camera rays) retires in the
            # full rounds — skip the mid stage's fixed cost outright
            st = jax.lax.cond(
                jnp.any(pend_vec(st) & ~st["retired"]),
                lambda s: compact_phase(
                    s, mid_w, MID_K, MID_KSUP, bounded=MID_ROUNDS
                ),
                lambda s: s,
                st,
            )
            final_w = max(1024, (-(-(n // FINAL_FRACTION) // 1024)) * 1024)
        else:
            final_w = nc
        if stop_after == "mid":
            pendc = jnp.sum(
                (pend_vec(st) & ~st["retired"]).astype(jnp.float32)
            )
            z = jnp.zeros_like(st["best_t"])
            return st["best_t"], z + pendc, z, z

        def outer(stf):
            out = compact_phase(
                stf, final_w, k_straggler, tail_ksup, bounded=None
            )
            out["outer"] = stf["outer"] + 1
            return out

        outer_cap = (n // final_w + 2) * 4
        st = jax.lax.while_loop(
            lambda s: (s["outer"] < outer_cap)
            & jnp.any(pend_vec(s) & ~s["retired"]),
            outer,
            {**st, "outer": jnp.zeros((), jnp.int32)},
        )
        st.pop("outer")
        st.pop("retired")

    if occlude:
        return (best_t0 > 0.0) & (st["best_t"] <= 0.0)

    # ---- exact recovery: the winning key NAMES the winner — chunk in
    # best_chunk, prim-in-chunk in the key's low _PBITS. Gather that one
    # prim's 10 pack floats and re-evaluate the same intersection formula
    # per ray (profiled r3: the previous chunk-wide recovery pass cost a
    # 10-op pack sort + a kernel pass + an unpack, ~15 ms at 131k rays;
    # this is 10 1-D gathers + a fusion). Cross-compilation ulps (Mosaic
    # keyed kernel vs this XLA evaluation) can flip a borderline validity
    # test, so a winner whose re-evaluation misses still reports the hit
    # at the key's band lower bound (within 2^-16 relative of exact t).
    bk = st["best_key"]
    found = bk != _INT_INF
    win = jnp.where(found, st["best_chunk"], 0)
    j_in = bk & jnp.int32((1 << _PBITS) - 1)
    if instanced:
        # winner names a GLOBAL virtual chunk: map to (local pack chunk,
        # instance), transform the ray into instance space, and gate the
        # ignore on instance identity — the slot id space (local chunk *
        # hchunk + j) matches soa.order exactly
        win_l = jnp.take(g2c, win)
        win_i = jnp.take(g2i, win)
        af = inst_f32.reshape(-1, 12)
        A = jnp.take(af, win_i, axis=0)  # (n, 12)
        o_rec = jnp.stack([
            A[:, 0] * o[:, 0] + A[:, 1] * o[:, 1] + A[:, 2] * o[:, 2] + A[:, 9],
            A[:, 3] * o[:, 0] + A[:, 4] * o[:, 1] + A[:, 5] * o[:, 2] + A[:, 10],
            A[:, 6] * o[:, 0] + A[:, 7] * o[:, 1] + A[:, 8] * o[:, 2] + A[:, 11],
        ], axis=1)
        d_rec = jnp.stack([
            A[:, 0] * d[:, 0] + A[:, 1] * d[:, 1] + A[:, 2] * d[:, 2],
            A[:, 3] * d[:, 0] + A[:, 4] * d[:, 1] + A[:, 5] * d[:, 2],
            A[:, 6] * d[:, 0] + A[:, 7] * d[:, 1] + A[:, 8] * d[:, 2],
        ], axis=1)
        ign_rec = jnp.where(
            ii_f == win_i.astype(jnp.float32), ign_f, -1.0
        )
    else:
        win_l, o_rec, d_rec, ign_rec = win, o, d, ign_f
    g = win_l * hb + jnp.where(found, j_in, 0)  # sorted global prim id
    # prim-major view: one contiguous 16-float row per prim, so the whole
    # fetch is ONE slice-16 gather (profiled r3: ten strided 1-D element
    # gathers cost 1.1 ms EACH at 131k rays; the 65 MB transpose is ~0.3
    # ms of HBM traffic and XLA materializes it once per trace)
    prim_major = prim_chunks.transpose(0, 2, 1).reshape(
        -1, prim_chunks.shape[1]
    )  # (C*HCHUNK, 16)
    rec = jnp.take(prim_major, g, axis=0)  # (n, 16)
    rows = tuple(rec[:, q] for q in range(10))
    t2, ok2, u2, v2 = _prim_hits_rows(
        rows, g.astype(jnp.float32), o_rec, d_rec, ign_rec, has_tri,
        has_sph, unit_dir=not instanced,
    )
    band_lb = jax.lax.bitcast_convert_type(
        bk & jnp.int32(-(1 << _PBITS)), jnp.float32
    )
    t4 = jnp.where(found, jnp.where(ok2, t2, band_lb), _INF)
    p4 = jnp.where(found, g.astype(jnp.float32), -1.0)
    u4 = jnp.where(found & ok2, u2, 0.0)
    v4 = jnp.where(found & ok2, v2, 0.0)
    if instanced:
        return t4, p4, u4, v4, jnp.where(found, win_i, 0)
    return t4, p4, u4, v4


# ---------------------------------------------------------------------------
# Public API (same contract as intersect_hier / occlude_hier)
# ---------------------------------------------------------------------------


def _inst_kwargs(soa: HierSoA, ignore, ignore_inst, n):
    """Instanced extra args for _trace_binned_impl (None-dict otherwise)."""
    if not soa.instanced:
        return {}
    ii = (
        jnp.zeros((n,), jnp.int32) if ignore_inst is None
        else jnp.asarray(ignore_inst, jnp.int32)
    )
    # no prim ignore -> instance identity is irrelevant; park at -1 so it
    # can never equal a segment instance with ign -1 matching a pad
    ii = jnp.where(jnp.asarray(ignore) >= 0, ii, -1)
    return dict(
        g2c=soa.binned_g2c, g2i=soa.binned_g2i, inst_f32=soa.inst_f32,
        ign_inst=ii,
    )


def trace_binned(geom, soa: HierSoA, o, d, t_max, ignore, ignore_inst=None,
                 *, rounds: int = 4096, k: int = 4, k_straggler: int = 32,
                 **phase_kw) -> Hit:
    """Closest-hit via binned traversal; same contract as intersect_hier
    (Hit.prim in storage ids, findFar semantics; instanced scenes return
    the placement in Hit.inst and honor per-instance ignores).
    `rounds` is a safety cap — the loop normally runs until every ray's
    frontier is exhausted. `phase_kw` forwards the phase-shape knobs
    (full_rounds/compact_fraction/ksup/tail_ksup) for perf sweeps."""
    n = o.shape[0]
    ign = _sorted_ignore(soa, ignore)
    cb = soa.binned_wcb if soa.instanced else soa.chunk_bounds
    out = _trace_binned_impl(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), ign,
        cb, soa.prim_chunks,
        soa.num_tris > 0, soa.num_prims > soa.num_tris, k, k_straggler,
        False, rounds, **phase_kw,
        **_inst_kwargs(soa, ignore, ignore_inst, n),
    )
    if soa.instanced:
        t, p, u, v, inst = out
    else:
        (t, p, u, v), inst = out, jnp.zeros((n,), jnp.int32)
    sorted_id = jnp.clip(p, 0.0, soa.order.shape[0] - 1).astype(jnp.int32)
    prim = jnp.where(p >= 0.0, soa.order[sorted_id], -1)
    found = prim >= 0
    return Hit(
        t=jnp.where(found, t, INF),
        prim=jnp.where(found, prim, -1),
        uv=jnp.stack([jnp.where(found, u, 0.0), jnp.where(found, v, 0.0)], -1),
        inst=jnp.where(found, inst, 0),
    )


def occlude_binned(geom, soa: HierSoA, o, d, t_max, ignore,
                   ignore_inst=None, *, rounds: int = 4096, k: int = 4,
                   k_straggler: int = 32, **phase_kw) -> jax.Array:
    """Any-hit within (EPS, t_max) via binned traversal; same contract as
    occlude_hier (instanced scenes honor per-instance ignores)."""
    n = o.shape[0]
    ign = _sorted_ignore(soa, ignore)
    cb = soa.binned_wcb if soa.instanced else soa.chunk_bounds
    return _trace_binned_impl(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)), ign,
        cb, soa.prim_chunks,
        soa.num_tris > 0, soa.num_prims > soa.num_tris, k, k_straggler,
        True, rounds, **phase_kw,
        **_inst_kwargs(soa, ignore, ignore_inst, n),
    )
