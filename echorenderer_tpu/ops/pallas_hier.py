"""Hierarchical Pallas traversal for large scenes: packet BVH over
DMA-streamed primitive chunks.

This is the TPU answer to the reference's production QBVH
(Aggregation/Acceleration/QuadBoundingVolumeHierarchy.cs:121-315): where
the CPU walks a 4-wide node hierarchy per ray with SIMD box tests, here a
whole 1024-ray block walks a binary SAH tree built over HCHUNK-primitive
*chunks* (the prims are already in BVH-leaf order, so chunks are spatially
tight). Traversal decisions are packet-wide: a node is entered when ANY
live ray can hit its box closer than its current best hit — one vector
slab test on the resident ray block, reduced to a scalar. Leaf chunks are
DMA'd HBM -> VMEM on demand and intersected with the same `_chunk_hits`
math as the dense kernel (ops/pallas_intersect.py), so the findFar sphere
semantics and prim-id space are identical.

Node storage: the flattened FlatBVH layout (children's bounds live in the
parent) serialized into two scalar-prefetch SMEM tables — 12 f32 bounds +
2 i32 child codes per node. A leaf code encodes the chunk id as -(1+chunk).
The per-block stack is an SMEM scratch array sized to the tree depth
(computed at build time).

Versus the dense grid-streamed kernel: the dense kernel pays one grid step
per (ray block, chunk) pair even when the packet test culls the chunk —
O(C) per block. This kernel visits only the O(log C + hit chunks) nodes the
packet can actually touch, which is what makes >=256k-primitive scenes
(BASELINE config #5) tractable.

Instancing (reference Aggregation/Preparation/PreparedInstance.cs:47-61,
TokenHierarchy.cs:17): the tree's top levels form a TLAS whose leaves are
*instances*. Popping an instance leaf transforms the resident ray block
into the instance's pack-local space (12 scalars from SMEM: the inverse
affine), pushes a RESTORE sentinel and then the pack's BLAS subtree; the
sentinel pop drains the chunk pipeline and restores the world-space rays.
Ray parameter t is invariant under the affine map (directions are NOT
renormalized), so best-t culling works across spaces unchanged. Leaf
chunks hold pack-LOCAL geometry shared by every instance — a thousand
instances of a 10k-tri pack cost one copy of the pack plus 12 floats each.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import INF, FlatGeometry, Hit
from .pallas_intersect import (
    PRIM_BLOCK,
    RAY_BLOCK,
    _chunk_hits,
    _interpret,
    _ray_cols,
    pack_sorted_prims,
)

_INF = 3.4e38

import os as _os

# prims per streamed leaf chunk (n_sub = HCHUNK // 128 sub-tiles); the env
# override exists for kernel-tuning experiments only
HCHUNK = int(_os.environ.get("ECHO_HCHUNK", "256"))
# build the hierarchical layout when the padded prim count reaches this
# (below it the dense two-level-culled kernel wins on fixed costs)
HIER_BUILD_MIN = 16384

# leaf-code sub-encoding (e = -(code+1)):
#   e <  INST_BASE           chunk leaf, chunk id = e
#   INST_BASE <= e < RESTORE instance leaf, instance id = e - INST_BASE
#   e == RESTORE_E           restore-world sentinel (pushed at inst entry)
INST_BASE = 1 << 23
RESTORE_E = 1 << 24
RESTORE_CODE = -(1 + RESTORE_E)


class HierSoA(NamedTuple):
    """Device tables for the hierarchical kernel."""

    prim_chunks: jax.Array  # (C, 16, HCHUNK) f32: rows 0-9 components, 10 is_sphere
    chunk_bounds: jax.Array  # (C, 6) f32 per-chunk AABB (lo xyz, hi xyz)
    bounds: jax.Array  # (B*12,) f32: per node, per child: min xyz / max xyz
    codes: jax.Array  # (B*2,) i32: child codes (>=0 node, <0 -(1+e))
    order: jax.Array  # (P,) int32 sorted slot -> storage prim id
    inv_order: jax.Array  # (P,) int32 storage id -> sorted slot
    inst_f32: jax.Array  # (I*12,) f32 per-instance inverse affine (A row-major, b)
    inst_codes: jax.Array  # (I,) i32 per-instance BLAS subtree root code
    # instanced binned-traversal tables (empty when not instanced): the
    # scene "unrolled" into G global virtual chunks — instance i
    # contributes its pack's chunk range, padded to a SUP multiple so
    # superchunks never span instances (ops/binned_trace.py)
    binned_g2c: jax.Array  # (G,) i32 global chunk -> local pack chunk
    binned_g2i: jax.Array  # (G,) i32 global chunk -> instance
    binned_wcb: jax.Array  # (G, 6) f32 WORLD-space AABB per global chunk
    root_code: int  # static: root node code (may itself be a leaf)
    stack_size: int  # static: SMEM stack length (tree depth + margin)
    num_tris: int
    num_prims: int
    instanced: bool = False  # static: TLAS/instance leaves present

    @property
    def num_chunks(self) -> int:
        return self.prim_chunks.shape[0]


jax.tree_util.register_pytree_node(
    HierSoA,
    lambda s: (tuple(s[:11]), tuple(s[11:])),
    lambda aux, xs: HierSoA(*xs, *aux),
)


def _tree_depth(child_code: np.ndarray, root: int) -> int:
    """Iterative max depth of the flattened binary tree."""
    depth = 0
    stack = [(root, 1)]
    while stack:
        node, d = stack.pop()
        depth = max(depth, d)
        if node >= 0:
            stack.append((int(child_code[node, 0]), d + 1))
            stack.append((int(child_code[node, 1]), d + 1))
    return depth


def _pack_chunk_rows(a, b, c, is_sph, *, pad, n_chunks):
    """Host assembly of the (C, 16, HCHUNK) chunk tensor + ONE upload.

    History (keep): r3 moved this on-device (host first-touch was ~10-25
    MB/s and the eager .at[].set chain dispatched per-op); r5 fixed the
    allocator (utils/hostmem.warm_host_allocator) and measured that even
    a persistent-cache HIT costs ~5-7 s of per-process executable load
    through the remote tunnel for this program (benchmarks/prep_fine.py)
    — far more than the ~0.3 s the 65 MB host assembly now takes."""
    p = a.shape[0]
    rows = np.zeros((16, pad), np.float32)
    # padded v0 far away, e1=e2=0 -> det=0 -> invalid
    rows[0:3, p:] = 1e30
    rows[0:3, :p] = a.T
    rows[3:6, :p] = b.T
    rows[6:9, :p] = c.T
    rows[9, :p] = is_sph
    chunks = np.ascontiguousarray(
        rows.reshape(16, n_chunks, HCHUNK).transpose(1, 0, 2)
    )
    return jnp.asarray(chunks)


def _pack_chunks(geom: FlatGeometry, order: np.ndarray, packed=None):
    """Pack prims (already permuted into `order`) into (C, 16, HCHUNK)
    chunk tensors plus per-chunk AABBs. Returns (prim_chunks, clo, chi);
    prim_chunks is a DEVICE array — the tensor is assembled on-device
    because this host first-touches fresh allocations at ~10-25 MB/s
    (profiled r3: the two host copies of the 65 MB tensor at 1M tris were
    ~12 s of prep). clo/chi stay host (the SAH chunk-tree builder needs
    them). `packed` = precomputed pack_sorted_prims(geom, order)."""
    p = len(order)
    a, b, c, is_sph, lo, hi = (
        packed if packed is not None else pack_sorted_prims(geom, order)
    )
    pad = -(-max(p, 1) // HCHUNK) * HCHUNK
    n_chunks = pad // HCHUNK

    prim_chunks = _pack_chunk_rows(
        np.ascontiguousarray(a), np.ascontiguousarray(b),
        np.ascontiguousarray(c), is_sph, pad=pad, n_chunks=n_chunks,
    )

    nfull = p // HCHUNK
    clo = np.full((n_chunks, 3), 1e30, np.float32)
    chi = np.full((n_chunks, 3), -1e30, np.float32)
    if nfull:
        clo[:nfull] = lo[: nfull * HCHUNK].reshape(nfull, HCHUNK, 3).min(1)
        chi[:nfull] = hi[: nfull * HCHUNK].reshape(nfull, HCHUNK, 3).max(1)
    if p > nfull * HCHUNK:
        clo[nfull] = lo[nfull * HCHUNK :].min(0)
        chi[nfull] = hi[nfull * HCHUNK :].max(0)
    return prim_chunks, clo, chi


def _chunk_tree(clo: np.ndarray, chi: np.ndarray, chunk_base: int,
                node_base: int):
    """Binary SAH tree over chunk AABBs with node indices offset by
    `node_base` and chunk-leaf codes offset by `chunk_base`. Returns
    (bounds (B,2,6), codes (B,2), root_code, depth); B may be 0 when a
    single chunk collapses to a leaf root."""
    from ..aggregation.bvh import build_bvh

    n = clo.shape[0]
    if n == 1:
        return (np.zeros((0, 2, 6), np.float32), np.zeros((0, 2), np.int32),
                -(1 + chunk_base), 1)
    host: dict = {}
    build_bvh(clo, chi, leaf_max=1, host_out=host)
    child_min = host["child_min"]
    child_max = host["child_max"]
    child_code = host["child_code"].copy()
    chunk_order = host["prim_order"]
    root = int(host["root_code"])
    assert root >= 0

    leaf = child_code < 0
    start = (-(child_code + 1)) >> 4
    child_code[leaf] = -(1 + chunk_base + chunk_order[start[leaf]])
    child_code[~leaf] += node_base
    bounds = np.concatenate([child_min, child_max], axis=2).astype(np.float32)
    depth = _offset_tree_depth(child_code, root + node_base, node_base)
    return bounds, child_code, root + node_base, depth


def _offset_tree_depth(child_code: np.ndarray, root: int, node_base: int) -> int:
    depth = 0
    stack = [(root, 1)]
    while stack:
        node, d = stack.pop()
        depth = max(depth, d)
        if node >= 0:
            local = node - node_base
            stack.append((int(child_code[local, 0]), d + 1))
            stack.append((int(child_code[local, 1]), d + 1))
    return depth


def build_hier_soa(geom: FlatGeometry, order: np.ndarray,
                   packed=None) -> HierSoA:
    """Host-side build for a single (non-instanced) geometry: pack prims
    (sorted order) into chunks and build a binary SAH tree over the chunk
    AABBs (reusing the production builder from aggregation/bvh.py,
    native-accelerated). `packed` = precomputed
    pack_sorted_prims(geom, order) shared with the dense builder."""
    t = geom.num_triangles
    p = t + geom.num_spheres
    order = np.asarray(order, np.int32)
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(p, dtype=np.int32)

    prim_chunks, clo, chi = _pack_chunks(geom, order, packed=packed)
    bounds, codes, root, depth = _chunk_tree(clo, chi, 0, 0)
    assert root >= 0, "hier tree root must be interior (>= 2 chunks)"

    return HierSoA(
        prim_chunks=jnp.asarray(prim_chunks),
        chunk_bounds=jnp.asarray(np.concatenate([clo, chi], axis=1)),
        bounds=jnp.asarray(bounds.reshape(-1)),
        codes=jnp.asarray(codes.reshape(-1)),
        order=jnp.asarray(order),
        inv_order=jnp.asarray(inv_order),
        inst_f32=jnp.zeros((0,), jnp.float32),
        inst_codes=jnp.zeros((0,), jnp.int32),
        binned_g2c=jnp.zeros((0,), jnp.int32),
        binned_g2i=jnp.zeros((0,), jnp.int32),
        binned_wcb=jnp.zeros((0, 6), jnp.float32),
        root_code=root,
        stack_size=depth + 8,
        num_tris=t,
        num_prims=p,
        instanced=False,
    )


def build_hier_soa_instanced(
    geom: FlatGeometry,
    pack_orders: list[np.ndarray],
    inst_pack: np.ndarray,
    inst_inv_a: np.ndarray,
    inst_inv_b: np.ndarray,
    inst_lo: np.ndarray,
    inst_hi: np.ndarray,
) -> HierSoA:
    """Instanced build. `geom` holds every pack's LOCAL-space primitives in
    one storage id space; `pack_orders[k]` is the BVH-leaf-ordered storage
    prim ids of pack k (its BLAS order). Per instance i: `inst_pack[i]` the
    pack id, `inst_inv_a[i]` (3,3) + `inst_inv_b[i]` (3,) the world->local
    inverse affine (x_local = A x + b), and `inst_lo/hi[i]` the world-space
    instance AABB (for the TLAS).

    Layout: chunks are packed per pack (padded to HCHUNK so no chunk spans
    packs) and concatenated; node storage = [TLAS nodes] ++ [pack subtrees]
    with absolute child codes. TLAS leaves encode -(1+INST_BASE+i).
    """
    from ..aggregation.bvh import build_bvh

    t = geom.num_triangles
    p = t + geom.num_spheres
    n_inst = len(inst_pack)

    # --- per-pack chunk packing + subtrees ---
    all_chunks, pack_roots, pack_depths = [], [], []
    order_parts = []
    bounds_parts, codes_parts = [], []
    chunk_base = 0
    # TLAS nodes occupy [0, n_tlas); pack subtree nodes follow. Build pack
    # trees first with a placeholder base, then offset once n_tlas is known
    # — instead, build TLAS first (it only needs instance AABBs).
    if n_inst >= 2:
        tlas_host: dict = {}
        build_bvh(
            np.asarray(inst_lo, np.float32), np.asarray(inst_hi, np.float32),
            leaf_max=1, host_out=tlas_host,
        )
        t_min = tlas_host["child_min"]
        t_max = tlas_host["child_max"]
        t_code = tlas_host["child_code"].copy()
        t_order = tlas_host["prim_order"]
        leaf = t_code < 0
        start = (-(t_code + 1)) >> 4
        t_code[leaf] = -(1 + INST_BASE + t_order[start[leaf]])
        tlas_bounds = np.concatenate([t_min, t_max], axis=2).astype(np.float32)
        tlas_codes = t_code
        root = int(tlas_host["root_code"])
        assert root >= 0
        n_tlas = tlas_bounds.shape[0]
        tlas_depth = _offset_tree_depth(tlas_codes, root, 0)
    else:
        tlas_bounds = np.zeros((0, 2, 6), np.float32)
        tlas_codes = np.zeros((0, 2), np.int32)
        root = -(1 + INST_BASE + 0)
        n_tlas = 0
        tlas_depth = 1

    node_base = n_tlas
    all_cb = []
    pack_ranges = []  # (first chunk, chunk count) per pack
    for order_k in pack_orders:
        order_k = np.asarray(order_k, np.int32)
        sub, pos = _sub_geometry(geom, order_k)
        chunks_k, clo_k, chi_k = _pack_chunks(sub, pos)
        b_k, c_k, root_k, depth_k = _chunk_tree(clo_k, chi_k, chunk_base, node_base)
        all_cb.append(np.concatenate([clo_k, chi_k], axis=1))
        all_chunks.append(chunks_k)
        bounds_parts.append(b_k)
        codes_parts.append(c_k)
        pack_roots.append(root_k)
        pack_depths.append(depth_k)
        order_parts.append(order_k)
        pack_ranges.append((chunk_base, chunks_k.shape[0]))
        chunk_base += chunks_k.shape[0]
        node_base += b_k.shape[0]

    order = np.concatenate(order_parts) if order_parts else np.zeros(0, np.int32)
    # sorted slot k corresponds to storage prim order[k']; padding within
    # pack chunk blocks shifts slots, so rebuild the slot map chunk-aligned
    slot_of = np.full(p, -1, np.int64)
    slot = 0
    sorted_ids = np.full(chunk_base * HCHUNK, -1, np.int64)
    for order_k in pack_orders:
        for pid in np.asarray(order_k, np.int64):
            sorted_ids[slot] = pid
            slot += 1
        slot = -(-slot // HCHUNK) * HCHUNK  # chunk padding gap
    valid = sorted_ids >= 0
    slot_of[sorted_ids[valid]] = np.nonzero(valid)[0]

    prim_chunks = jnp.concatenate(all_chunks, 0)  # device tensors
    bounds = np.concatenate([tlas_bounds] + bounds_parts, 0)
    codes = np.concatenate([tlas_codes] + codes_parts, 0)
    if bounds.shape[0] == 0:
        # degenerate single-instance/single-chunk scene: the walk still
        # reads node 0's slots under the leaf mask — keep them in bounds
        bounds = np.zeros((1, 2, 6), np.float32)
        codes = np.zeros((1, 2), np.int32)

    # kernel-facing order/inv_order operate on chunk-aligned slots: order
    # maps slot -> storage id (padding slots -1 -> clamp), inv maps id -> slot
    order_slots = np.where(sorted_ids >= 0, sorted_ids, 0).astype(np.int32)

    inst_f32 = np.concatenate(
        [np.asarray(inst_inv_a, np.float32).reshape(n_inst, 9),
         np.asarray(inst_inv_b, np.float32).reshape(n_inst, 3)], axis=1
    ).reshape(-1)
    inst_codes = np.asarray([pack_roots[k] for k in inst_pack], np.int32)

    # --- instanced binned-traversal tables (ops/binned_trace.py): the
    # scene unrolled into global virtual chunks with WORLD AABBs. Each
    # instance contributes its pack's chunk range, padded to a SUP
    # multiple so superchunks never span instances; padding rows get an
    # empty (+INF, -INF) box (fails every slab test).
    from .binned_trace import SUP as _BSUP

    cb_np = np.concatenate(all_cb, axis=0) if all_cb else np.zeros((0, 6), np.float32)
    g2c_parts, g2i_parts, wcb_parts = [], [], []
    for i in range(n_inst):
        base, cnt = pack_ranges[int(inst_pack[i])]
        cpad = -(-cnt // _BSUP) * _BSUP
        ids = np.arange(cpad, dtype=np.int32)
        g2c_parts.append(np.where(ids < cnt, base + ids, base).astype(np.int32))
        g2i_parts.append(np.full(cpad, i, np.int32))
        # world box per chunk: exact affine AABB transform (min/max of the
        # per-term products, the standard 8-corner closed form)
        A = np.asarray(inst_inv_a[i], np.float32)  # world -> local
        bvec = np.asarray(inst_inv_b[i], np.float32)
        F = np.linalg.inv(np.asarray(A, np.float64)).astype(np.float32)
        off = (-F @ bvec).astype(np.float32)  # local -> world
        lo = cb_np[base : base + cnt, 0:3]
        hi = cb_np[base : base + cnt, 3:6]
        p1 = F[None, :, :] * lo[:, None, :]
        p2 = F[None, :, :] * hi[:, None, :]
        wlo = off[None] + np.minimum(p1, p2).sum(-1)
        whi = off[None] + np.maximum(p1, p2).sum(-1)
        w = np.full((cpad, 6), np.float32(3.4e38), np.float32)
        w[:, 3:6] = -3.4e38
        w[:cnt, 0:3] = wlo
        w[:cnt, 3:6] = whi
        wcb_parts.append(w)
    if n_inst and sum(p.shape[0] for p in g2c_parts) <= 1 << 20:
        binned_g2c = np.concatenate(g2c_parts)
        binned_g2i = np.concatenate(g2i_parts)
        binned_wcb = np.concatenate(wcb_parts, axis=0)
    else:
        # > 2^20 global virtual chunks would overflow the chunk-key id
        # field — leave the binned tables empty so dispatch falls back to
        # the packet TLAS walk instead of crashing prep (ADVICE r4 #2)
        binned_g2c = np.zeros((0,), np.int32)
        binned_g2i = np.zeros((0,), np.int32)
        binned_wcb = np.zeros((0, 6), np.float32)

    depth = tlas_depth + max(pack_depths) + 2  # +RESTORE and inst push margin
    return HierSoA(
        prim_chunks=jnp.asarray(prim_chunks),
        chunk_bounds=jnp.asarray(np.concatenate(all_cb, axis=0)),
        bounds=jnp.asarray(bounds.reshape(-1)),
        codes=jnp.asarray(codes.reshape(-1)),
        order=jnp.asarray(order_slots),
        inv_order=jnp.asarray(slot_of.astype(np.int32)),
        inst_f32=jnp.asarray(inst_f32),
        inst_codes=jnp.asarray(inst_codes),
        binned_g2c=jnp.asarray(binned_g2c),
        binned_g2i=jnp.asarray(binned_g2i),
        binned_wcb=jnp.asarray(binned_wcb),
        root_code=root,
        stack_size=depth + 8,
        num_tris=t,
        num_prims=p,
        instanced=True,
    )


def _sub_geometry(geom: FlatGeometry, ids: np.ndarray):
    """Sub-geometry restricted to storage prim ids `ids` plus the
    permutation that restores the caller's id order (FlatGeometry groups
    tris before spheres; pack_sorted_prims(sub, pos) then yields prims in
    the requested sequence). Only the fields pack_sorted_prims reads are
    populated."""
    t = geom.num_triangles
    ids = np.asarray(ids, np.int64)
    tri_ids = ids[ids < t]
    sph_ids = ids[ids >= t] - t
    sel = lambda a, idx, w: (
        np.asarray(a)[idx]
        if len(idx)
        else np.zeros((0,) + ((w,) if w else ()), np.float32)
    )
    z2 = np.zeros((len(tri_ids), 2), np.float32)
    z3 = np.zeros((len(tri_ids), 3), np.float32)
    sub = FlatGeometry(
        tri_v0=sel(geom.tri_v0, tri_ids, 3), tri_e1=sel(geom.tri_e1, tri_ids, 3),
        tri_e2=sel(geom.tri_e2, tri_ids, 3),
        tri_n0=z3, tri_n1=z3, tri_n2=z3, tri_uv0=z2, tri_uv1=z2, tri_uv2=z2,
        tri_mat=np.zeros(len(tri_ids), np.int32),
        sph_center=sel(geom.sph_center, sph_ids, 3),
        sph_radius=sel(geom.sph_radius, sph_ids, 0),
        sph_mat=np.zeros(len(sph_ids), np.int32),
    )
    pos = np.empty(len(ids), np.int64)
    pos[ids < t] = np.arange(len(tri_ids))
    pos[ids >= t] = len(tri_ids) + np.arange(len(sph_ids))
    return sub, pos.astype(np.int32)


def _row(ref):
    return ref[:].reshape(1, -1)


def _slab(bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z,
          ox, oy, oz, ix, iy, iz, limit):
    t0x = (bmin_x - ox) * ix
    t0y = (bmin_y - oy) * iy
    t0z = (bmin_z - oz) * iz
    t1x = (bmax_x - ox) * ix
    t1y = (bmax_y - oy) * iy
    t1z = (bmax_z - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    ok = (tn <= tf) & (tf > 0.0) & (tn < limit)
    return jnp.any(ok), jnp.min(jnp.where(ok, tn, _INF))


def _hier_kernel(*refs, root_code, n_sub, has_tri, has_sph, any_hit,
                 instanced):
    """Packet tree walk. Ref layout (in order):
      scalar prefetch: bounds, codes[, inst_f32, inst_i32]
      ray cols: ox oy oz dx dy dz tmax ign[ igninst]
      prim_hbm
      outputs: blocked | (t p u v[ inst])
      scratch: pscratch stack dstate[ rstate cur_inst] sem0 sem1
    """
    i = 0
    bounds_ref = refs[i]; i += 1
    codes_ref = refs[i]; i += 1
    if instanced:
        instf_ref = refs[i]; i += 1
        insti_ref = refs[i]; i += 1
    ray_refs = refs[i : i + 8]; i += 8
    if instanced:
        igninst_ref = refs[i]; i += 1
    prim_hbm = refs[i]; i += 1
    if any_hit:
        out_ref = refs[i]; i += 1
    else:
        t_out = refs[i]; p_out = refs[i + 1]; u_out = refs[i + 2]
        v_out = refs[i + 3]; i += 4
        if instanced:
            i_out = refs[i]; i += 1
    pscratch = refs[i]; stack = refs[i + 1]; dstate = refs[i + 2]; i += 3
    if instanced:
        rstate = refs[i]; cur_inst = refs[i + 1]; i += 2
    sem0 = refs[i]; sem1 = refs[i + 1]

    S = (1, RAY_BLOCK // 128, 128)
    w_ox, w_oy, w_oz = (_row(r) for r in ray_refs[0:3])
    w_dx, w_dy, w_dz = (_row(r) for r in ray_refs[3:6])
    tmax = _row(ray_refs[6])
    ign = _row(ray_refs[7])

    inv = lambda d: jnp.where(
        jnp.abs(d) < 1e-12, 1e12 * jnp.where(d < 0, -1.0, 1.0), 1.0 / d
    )
    w_ix, w_iy, w_iz = inv(w_dx), inv(w_dy), inv(w_dz)

    if instanced:
        ign_inst = _row(igninst_ref)
        # resident ray state: rows 0-2 o, 3-5 d, 6-8 inv d (current space)
        for k, r in enumerate((w_ox, w_oy, w_oz, w_dx, w_dy, w_dz,
                               w_ix, w_iy, w_iz)):
            rstate[k] = r.reshape(-1)
        cur_inst[0] = -1

    def rays():
        if instanced:
            rs = lambda k: rstate[k].reshape(1, -1)
            return (rs(0), rs(1), rs(2), rs(3), rs(4), rs(5),
                    rs(6), rs(7), rs(8))
        return (w_ox, w_oy, w_oz, w_dx, w_dy, w_dz, w_ix, w_iy, w_iz)

    # init outputs (they double as the running state)
    if any_hit:
        out_ref[:] = jnp.zeros(S, jnp.float32)
    else:
        t_out[:] = tmax.reshape(S)
        p_out[:] = jnp.full(S, -1.0, jnp.float32)
        u_out[:] = jnp.zeros(S, jnp.float32)
        v_out[:] = jnp.zeros(S, jnp.float32)
        if instanced:
            i_out[:] = jnp.zeros(S, jnp.float32)

    # occupancy gate: dead blocks (regeneration tails, t_max <= 0) skip
    # the walk outright
    alive = jnp.any(tmax > 0.0)
    stack[0] = root_code
    sp0 = jnp.where(alive, 1, 0)
    dstate[0] = -1  # chunk id whose DMA is in flight (-1: none)
    dstate[1] = 0  # double buffer that in-flight DMA targets

    def wait_and_intersect():
        """Wait for the pending chunk's DMA and intersect it (double-buffer
        drain: called when the NEXT leaf's DMA has already been started, so
        the copy flies while this runs). Under instancing the pending chunk
        always belongs to the CURRENT instance (the pipeline is drained
        before any ray-space switch)."""
        pend = dstate[0]
        buf = dstate[1]

        @pl.when(buf == 0)
        def _():
            pltpu.make_async_copy(prim_hbm.at[pend], pscratch.at[0], sem0).wait()

        @pl.when(buf == 1)
        def _():
            pltpu.make_async_copy(prim_hbm.at[pend], pscratch.at[1], sem1).wait()

        ox, oy, oz, dx, dy, dz, _, _, _ = rays()
        if instanced:
            # the ignore prim applies only inside its own instance
            eff_ign = jnp.where(
                ign_inst == cur_inst[0].astype(jnp.float32), ign, -1.0
            )
        else:
            eff_ign = ign

        src = pscratch[buf]  # (16, HCHUNK) dynamic-indexed VMEM load
        if any_hit:
            prev = out_ref[:].reshape(1, -1)
            lim = jnp.where(prev > 0.5, -1.0, tmax)
        else:
            best_t = t_out[:].reshape(1, -1)
            best_p = p_out[:].reshape(1, -1)
            best_u = u_out[:].reshape(1, -1)
            best_v = v_out[:].reshape(1, -1)
            if instanced:
                best_i = i_out[:].reshape(1, -1)
        for s in range(n_sub):
            rows = [src[i : i + 1, s * 128 : (s + 1) * 128] for i in range(10)]
            k_base = (pend * HCHUNK + s * 128).astype(jnp.float32)
            t, u, v, pid = _chunk_hits(
                rows, k_base, ox, oy, oz, dx, dy, dz, eff_ign, has_tri,
                has_sph, unit_dir=not instanced,
            )
            if any_hit:
                hit = jnp.any(t < lim, axis=0, keepdims=True)
                prev = jnp.where(hit, 1.0, prev)
            else:
                tm = jnp.min(t, axis=0, keepdims=True)
                sel = t <= tm
                pm = jnp.min(jnp.where(sel, pid, _INF), axis=0, keepdims=True)
                um = jnp.sum(jnp.where(sel & (pid == pm), u, 0.0), axis=0, keepdims=True)
                vm = jnp.sum(jnp.where(sel & (pid == pm), v, 0.0), axis=0, keepdims=True)
                closer = tm < best_t
                best_t = jnp.where(closer, tm, best_t)
                best_p = jnp.where(closer, pm, best_p)
                best_u = jnp.where(closer, um, best_u)
                best_v = jnp.where(closer, vm, best_v)
                if instanced:
                    best_i = jnp.where(closer, cur_inst[0].astype(jnp.float32), best_i)
        if any_hit:
            out_ref[:] = prev.reshape(S)
        else:
            t_out[:] = best_t.reshape(S)
            p_out[:] = best_p.reshape(S)
            u_out[:] = best_u.reshape(S)
            v_out[:] = best_v.reshape(S)
            if instanced:
                i_out[:] = best_i.reshape(S)

    def body(sp):
        code = stack[sp - 1]
        sp = sp - 1
        is_leaf = code < 0
        e = -(code + 1)

        if any_hit:
            blocked = out_ref[:].reshape(1, -1)
            limit = jnp.where(blocked > 0.5, -1.0, tmax)
        else:
            limit = t_out[:].reshape(1, -1)

        ox, oy, oz, dx, dy, dz, ix, iy, iz = rays()

        node = jnp.maximum(code, 0)
        base = node * 12
        h0, tn0 = _slab(
            bounds_ref[base + 0], bounds_ref[base + 1], bounds_ref[base + 2],
            bounds_ref[base + 3], bounds_ref[base + 4], bounds_ref[base + 5],
            ox, oy, oz, ix, iy, iz, limit,
        )
        h1, tn1 = _slab(
            bounds_ref[base + 6], bounds_ref[base + 7], bounds_ref[base + 8],
            bounds_ref[base + 9], bounds_ref[base + 10], bounds_ref[base + 11],
            ox, oy, oz, ix, iy, iz, limit,
        )
        h0 = h0 & ~is_leaf
        h1 = h1 & ~is_leaf
        c0 = codes_ref[2 * node]
        c1 = codes_ref[2 * node + 1]

        # push far child first so the near one pops first (tightens best_t
        # earliest -> better culling downstream)
        near0 = tn0 <= tn1
        far_code = jnp.where(near0, c1, c0)
        far_hit = jnp.where(near0, h1, h0)
        near_code = jnp.where(near0, c0, c1)
        near_hit = jnp.where(near0, h0, h1)

        @pl.when(far_hit)
        def _():
            stack[sp] = far_code

        sp1 = sp + far_hit.astype(jnp.int32)

        @pl.when(near_hit)
        def _():
            stack[sp1] = near_code

        sp2 = sp1 + near_hit.astype(jnp.int32)

        if instanced:
            is_restore = is_leaf & (e == RESTORE_E)
            is_inst = is_leaf & (e >= INST_BASE) & ~is_restore
            is_chunk = is_leaf & (e < INST_BASE)
        else:
            is_chunk = is_leaf

        @pl.when(is_chunk)
        def _():
            # pipelined leaf: start THIS chunk's DMA into the other buffer,
            # then intersect the PREVIOUS chunk while the copy flies
            chunk = e
            pend = dstate[0]
            nb = jnp.where(pend >= 0, 1 - dstate[1], 0)

            @pl.when(nb == 0)
            def _():
                pltpu.make_async_copy(prim_hbm.at[chunk], pscratch.at[0], sem0).start()

            @pl.when(nb == 1)
            def _():
                pltpu.make_async_copy(prim_hbm.at[chunk], pscratch.at[1], sem1).start()

            pl.when(pend >= 0)(wait_and_intersect)
            dstate[0] = chunk
            dstate[1] = nb

        if instanced:

            @pl.when(is_inst)
            def _():
                # drain the pipeline (its chunk used the previous space),
                # then switch the resident rays into this instance's local
                # space and descend into its BLAS
                pl.when(dstate[0] >= 0)(wait_and_intersect)
                dstate[0] = -1
                inst = e - INST_BASE
                fb = inst * 12
                a = [instf_ref[fb + k] for k in range(9)]
                b = [instf_ref[fb + 9 + k] for k in range(3)]
                lox = a[0] * w_ox + a[1] * w_oy + a[2] * w_oz + b[0]
                loy = a[3] * w_ox + a[4] * w_oy + a[5] * w_oz + b[1]
                loz = a[6] * w_ox + a[7] * w_oy + a[8] * w_oz + b[2]
                ldx = a[0] * w_dx + a[1] * w_dy + a[2] * w_dz
                ldy = a[3] * w_dx + a[4] * w_dy + a[5] * w_dz
                ldz = a[6] * w_dx + a[7] * w_dy + a[8] * w_dz
                for k, r in enumerate((lox, loy, loz, ldx, ldy, ldz,
                                       inv(ldx), inv(ldy), inv(ldz))):
                    rstate[k] = r.reshape(-1)
                cur_inst[0] = inst

            sp_inst = sp2  # captured before the pushes below

            @pl.when(is_inst)
            def _():
                stack[sp_inst] = RESTORE_CODE
                stack[sp_inst + 1] = insti_ref[jnp.maximum(e - INST_BASE, 0)]

            sp2 = sp2 + jnp.where(is_inst, 2, 0)

            @pl.when(is_restore)
            def _():
                # drain under the instance's space, then restore world rays
                pl.when(dstate[0] >= 0)(wait_and_intersect)
                dstate[0] = -1
                for k, r in enumerate((w_ox, w_oy, w_oz, w_dx, w_dy, w_dz,
                                       w_ix, w_iy, w_iz)):
                    rstate[k] = r.reshape(-1)
                cur_inst[0] = -1

        if any_hit:
            # early exit once every live ray is blocked (the lagging
            # pending chunk is drained after the loop regardless)
            done = ~jnp.any((out_ref[:].reshape(1, -1) < 0.5) & (tmax > 0.0))
            sp2 = jnp.where(done, 0, sp2)
        return sp2

    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
    pl.when(dstate[0] >= 0)(wait_and_intersect)  # drain the last chunk


def _build_call(soa_static, any_hit):
    root_code, stack_size, num_tris, num_prims, instanced = soa_static
    kernel = functools.partial(
        _hier_kernel,
        root_code=root_code,
        n_sub=HCHUNK // 128,
        has_tri=num_tris > 0,
        has_sph=num_prims > num_tris,
        any_hit=any_hit,
        instanced=instanced,
    )
    n_ray_cols = 9 if instanced else 8
    n_out = 1 if any_hit else (5 if instanced else 4)
    n_prefetch = 4 if instanced else 2

    def index_map(*args):
        # grid index + prefetch refs appended; ray blocks walk the grid
        return (args[0], 0, 0)

    ray_spec = pl.BlockSpec(
        (1, RAY_BLOCK // 128, 128), index_map, memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((2, 16, HCHUNK), jnp.float32),  # double buffer
        pltpu.SMEM((stack_size,), jnp.int32),
        pltpu.SMEM((2,), jnp.int32),  # (pending chunk, its buffer)
    ]
    if instanced:
        scratch.append(pltpu.VMEM((9, RAY_BLOCK), jnp.float32))  # ray state
        scratch.append(pltpu.SMEM((1,), jnp.int32))  # current instance
    scratch.append(pltpu.SemaphoreType.DMA(()))
    scratch.append(pltpu.SemaphoreType.DMA(()))

    def call(cols, prim_chunks, bounds, codes, inst_f32, inst_codes):
        g = cols[0].shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(g,),
            in_specs=[ray_spec] * n_ray_cols + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[ray_spec] * n_out if n_out > 1 else ray_spec,
            scratch_shapes=scratch,
        )
        out_shape = jax.ShapeDtypeStruct((g, RAY_BLOCK // 128, 128), jnp.float32)
        out_shapes = [out_shape] * n_out if n_out > 1 else out_shape
        prefetch = (bounds, codes, inst_f32, inst_codes) if instanced else (bounds, codes)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(*prefetch, *cols, prim_chunks)

    return call


@functools.partial(jax.jit, static_argnames=("soa_static",))
def _hier_trace_call(cols, prim_chunks, bounds, codes, inst_f32, inst_codes,
                     soa_static):
    out = _build_call(soa_static, any_hit=False)(
        cols, prim_chunks, bounds, codes, inst_f32, inst_codes
    )
    instanced = soa_static[4]
    if instanced:
        t, p, u, v, ii = out
        return (t.reshape(-1), p.reshape(-1), u.reshape(-1), v.reshape(-1),
                ii.reshape(-1))
    t, p, u, v = out
    return t.reshape(-1), p.reshape(-1), u.reshape(-1), v.reshape(-1), None


@functools.partial(jax.jit, static_argnames=("soa_static",))
def _hier_occlude_call(cols, prim_chunks, bounds, codes, inst_f32, inst_codes,
                       soa_static):
    blocked = _build_call(soa_static, any_hit=True)(
        cols, prim_chunks, bounds, codes, inst_f32, inst_codes
    )
    return blocked.reshape(-1)


def _sorted_ignore(soa: HierSoA, ignore):
    ig = soa.inv_order[jnp.maximum(ignore, 0)]
    return jnp.where(ignore >= 0, ig, -1)


def _static(soa: HierSoA):
    return (soa.root_code, soa.stack_size, soa.num_tris, soa.num_prims,
            soa.instanced)


def _cols_with_inst(soa, o, d, t_max, ignore, ignore_inst, n_pad):
    cols = _ray_cols(o, d, t_max, _sorted_ignore(soa, ignore), n_pad)
    if not soa.instanced:
        return cols
    n = o.shape[0]
    if ignore_inst is None:
        ii = jnp.full((n,), -1.0, jnp.float32)
    else:
        ii = jnp.where(ignore >= 0, ignore_inst.astype(jnp.float32), -1.0)
    ii = jnp.pad(ii, (0, n_pad - n), constant_values=-1.0)
    return cols + (ii.reshape(-1, RAY_BLOCK // 128, 128),)


def intersect_hier(geom: FlatGeometry, soa: HierSoA, o, d, t_max, ignore,
                   ignore_inst=None) -> Hit:
    """Closest-hit via the hierarchical packet kernel. Same contract as
    intersect_pallas (Hit.prim in storage/original prim ids); instanced
    scenes also report Hit.inst (which instance owns the hit)."""
    n = o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    cols = _cols_with_inst(soa, o, d, t_max, ignore, ignore_inst, n_pad)
    t, p, u, v, ii = _hier_trace_call(
        cols, soa.prim_chunks, soa.bounds, soa.codes, soa.inst_f32,
        soa.inst_codes, _static(soa),
    )
    t, p, u, v = t[:n], p[:n], u[:n], v[:n]
    # padded prims can never win (v0 at 1e30 / det 0), so p < slot count
    sorted_id = jnp.clip(p, 0.0, soa.order.shape[0] - 1).astype(jnp.int32)
    prim = jnp.where(p >= 0.0, soa.order[sorted_id], -1)
    found = prim >= 0
    uv = jnp.stack([u, v], axis=-1)
    inst = (
        jnp.where(found, ii[:n].astype(jnp.int32), 0)
        if ii is not None
        else jnp.zeros((n,), jnp.int32)
    )
    return Hit(
        t=jnp.where(found, t, INF),
        prim=jnp.where(found, prim, -1),
        uv=uv,
        inst=inst,
    )


def occlude_hier(geom: FlatGeometry, soa: HierSoA, o, d, t_max, ignore,
                 ignore_inst=None) -> jax.Array:
    n = o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    cols = _cols_with_inst(soa, o, d, t_max, ignore, ignore_inst, n_pad)
    blocked = _hier_occlude_call(
        cols, soa.prim_chunks, soa.bounds, soa.codes, soa.inst_f32,
        soa.inst_codes, _static(soa),
    )
    return blocked[:n] > 0.5
