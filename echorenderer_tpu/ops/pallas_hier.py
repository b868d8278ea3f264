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


class HierSoA(NamedTuple):
    """Device tables for the hierarchical kernel."""

    prim_chunks: jax.Array  # (C, 16, HCHUNK) f32: rows 0-9 components, 10 is_sphere
    bounds: jax.Array  # (B*12,) f32: per node, per child: min xyz / max xyz
    codes: jax.Array  # (B*2,) i32: child codes (>=0 node, <0 -(1+chunk))
    order: jax.Array  # (P,) int32 sorted slot -> original prim id
    inv_order: jax.Array  # (P,) int32 original id -> sorted slot
    root_code: int  # static: root node index
    stack_size: int  # static: SMEM stack length (tree depth + margin)
    num_tris: int
    num_prims: int

    @property
    def num_chunks(self) -> int:
        return self.prim_chunks.shape[0]


jax.tree_util.register_pytree_node(
    HierSoA,
    lambda s: (tuple(s[:5]), tuple(s[5:])),
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


def build_hier_soa(geom: FlatGeometry, order: np.ndarray) -> HierSoA:
    """Host-side build: pack prims (sorted order) into (C, 16, HCHUNK)
    chunks and build a binary SAH tree over the chunk AABBs (reusing the
    production builder from aggregation/bvh.py, native-accelerated)."""
    from ..aggregation.bvh import build_bvh

    t = geom.num_triangles
    p = t + geom.num_spheres
    order = np.asarray(order, np.int32)
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(p, dtype=np.int32)

    a, b, c, is_sph, lo, hi = pack_sorted_prims(geom, order)
    pad = -(-p // HCHUNK) * HCHUNK
    n_chunks = pad // HCHUNK

    rows = np.zeros((16, pad), np.float32)
    rows[0, :] = 1e30  # padded v0 far away, e1=e2=0 -> det 0 -> invalid
    rows[1, :] = 1e30
    rows[2, :] = 1e30
    comp = [a[:, 0], a[:, 1], a[:, 2], b[:, 0], b[:, 1], b[:, 2],
            c[:, 0], c[:, 1], c[:, 2], is_sph]
    for i, col in enumerate(comp):
        rows[i, :p] = col
    prim_chunks = rows.reshape(16, n_chunks, HCHUNK).transpose(1, 0, 2).copy()

    # per-chunk AABBs over the real prims only
    clo = np.full((n_chunks, 3), 1e30, np.float32)
    chi = np.full((n_chunks, 3), -1e30, np.float32)
    for ci in range(n_chunks):
        seg = slice(ci * HCHUNK, min((ci + 1) * HCHUNK, p))
        if seg.start < p:
            clo[ci] = lo[seg].min(0)
            chi[ci] = hi[seg].max(0)

    tree = build_bvh(clo, chi, leaf_max=1)
    child_min = np.asarray(tree.child_min)
    child_max = np.asarray(tree.child_max)
    child_code = np.asarray(tree.child_code).copy()
    chunk_order = np.asarray(tree.prim_order)
    root = int(tree.root_code)
    assert root >= 0, "hier tree root must be interior (>= 2 chunks)"

    # re-encode leaf codes -(1+(start<<4)+count) -> -(1+chunk_id)
    leaf = child_code < 0
    start = (-(child_code + 1)) >> 4
    child_code[leaf] = -(1 + chunk_order[start[leaf]])

    bounds = np.concatenate(
        [child_min, child_max], axis=2  # (B, 2, 6): min xyz, max xyz
    ).reshape(-1).astype(np.float32)
    depth = _tree_depth(child_code, root)

    return HierSoA(
        prim_chunks=jnp.asarray(prim_chunks),
        bounds=jnp.asarray(bounds),
        codes=jnp.asarray(child_code.reshape(-1)),
        order=jnp.asarray(order),
        inv_order=jnp.asarray(inv_order),
        root_code=root,
        stack_size=depth + 8,
        num_tris=t,
        num_prims=p,
    )


def _row(ref):
    return ref[:].reshape(1, -1)


def _child_slab(bounds_ref, node, side, ox, oy, oz, ix, iy, iz, limit):
    """Vector slab test of the whole ray block against one child AABB read
    from SMEM. Returns (any-ray-hit scalar, min entry distance scalar)."""
    base = node * 12 + side * 6
    t0x = (bounds_ref[base + 0] - ox) * ix
    t0y = (bounds_ref[base + 1] - oy) * iy
    t0z = (bounds_ref[base + 2] - oz) * iz
    t1x = (bounds_ref[base + 3] - ox) * ix
    t1y = (bounds_ref[base + 4] - oy) * iy
    t1z = (bounds_ref[base + 5] - oz) * iz
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


def _hier_kernel(bounds_ref, codes_ref, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                 tmax_r, ign_r, prim_hbm, *outs_and_scratch,
                 root_code, n_sub, has_tri, has_sph, any_hit):
    if any_hit:
        (out_ref, pscratch, stack, dstate, sem0, sem1) = outs_and_scratch
    else:
        (t_out, p_out, u_out, v_out, pscratch, stack, dstate, sem0, sem1) = (
            outs_and_scratch
        )

    S = (1, RAY_BLOCK // 128, 128)
    ox, oy, oz = _row(ox_r), _row(oy_r), _row(oz_r)
    dx, dy, dz = _row(dx_r), _row(dy_r), _row(dz_r)
    tmax = _row(tmax_r)
    ign = _row(ign_r)

    inv = lambda d: jnp.where(
        jnp.abs(d) < 1e-12, 1e12 * jnp.where(d < 0, -1.0, 1.0), 1.0 / d
    )
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    # init outputs (they double as the running state)
    if any_hit:
        out_ref[:] = jnp.zeros(S, jnp.float32)
    else:
        t_out[:] = tmax.reshape(S)
        p_out[:] = jnp.full(S, -1.0, jnp.float32)
        u_out[:] = jnp.zeros(S, jnp.float32)
        v_out[:] = jnp.zeros(S, jnp.float32)

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
        the copy flies while this runs)."""
        pend = dstate[0]
        buf = dstate[1]

        @pl.when(buf == 0)
        def _():
            pltpu.make_async_copy(prim_hbm.at[pend], pscratch.at[0], sem0).wait()

        @pl.when(buf == 1)
        def _():
            pltpu.make_async_copy(prim_hbm.at[pend], pscratch.at[1], sem1).wait()

        src = pscratch[buf]  # (16, HCHUNK) dynamic-indexed VMEM load
        if any_hit:
            prev = out_ref[:].reshape(1, -1)
            lim = jnp.where(prev > 0.5, -1.0, tmax)
        else:
            best_t = t_out[:].reshape(1, -1)
            best_p = p_out[:].reshape(1, -1)
            best_u = u_out[:].reshape(1, -1)
            best_v = v_out[:].reshape(1, -1)
        for s in range(n_sub):
            rows = [src[i : i + 1, s * 128 : (s + 1) * 128] for i in range(10)]
            k_base = (pend * HCHUNK + s * 128).astype(jnp.float32)
            t, u, v, pid = _chunk_hits(
                rows, k_base, ox, oy, oz, dx, dy, dz, ign, has_tri, has_sph
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
        if any_hit:
            out_ref[:] = prev.reshape(S)
        else:
            t_out[:] = best_t.reshape(S)
            p_out[:] = best_p.reshape(S)
            u_out[:] = best_u.reshape(S)
            v_out[:] = best_v.reshape(S)

    def body(sp):
        code = stack[sp - 1]
        sp = sp - 1
        is_leaf = code < 0

        if any_hit:
            blocked = out_ref[:].reshape(1, -1)
            limit = jnp.where(blocked > 0.5, -1.0, tmax)
        else:
            limit = t_out[:].reshape(1, -1)

        node = jnp.maximum(code, 0)
        h0, tn0 = _child_slab(bounds_ref, node, 0, ox, oy, oz, ix, iy, iz, limit)
        h1, tn1 = _child_slab(bounds_ref, node, 1, ox, oy, oz, ix, iy, iz, limit)
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

        @pl.when(is_leaf)
        def _():
            # pipelined leaf: start THIS chunk's DMA into the other buffer,
            # then intersect the PREVIOUS chunk while the copy flies
            chunk = -(code + 1)
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

        if any_hit:
            # early exit once every live ray is blocked (the lagging
            # pending chunk is drained after the loop regardless)
            done = ~jnp.any((out_ref[:].reshape(1, -1) < 0.5) & (tmax > 0.0))
            sp2 = jnp.where(done, 0, sp2)
        return sp2

    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
    pl.when(dstate[0] >= 0)(wait_and_intersect)  # drain the last chunk


@functools.partial(
    jax.jit, static_argnames=("root_code", "stack_size", "num_tris", "num_prims")
)
def _hier_trace_call(cols, prim_chunks, bounds, codes, root_code, stack_size,
                     num_tris, num_prims):
    g = cols[0].shape[0]
    kernel = functools.partial(
        _hier_kernel,
        root_code=root_code,
        n_sub=HCHUNK // 128,
        has_tri=num_tris > 0,
        has_sph=num_prims > num_tris,
        any_hit=False,
    )
    ray_spec = pl.BlockSpec(
        (1, RAY_BLOCK // 128, 128), lambda i, b, c: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((g, RAY_BLOCK // 128, 128), jnp.float32)] * 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[ray_spec] * 8 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ray_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, 16, HCHUNK), jnp.float32),  # double buffer
            pltpu.SMEM((stack_size,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),  # (pending chunk, its buffer)
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    t, p, u, v = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(bounds, codes, *cols, prim_chunks)
    return t.reshape(-1), p.reshape(-1), u.reshape(-1), v.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("root_code", "stack_size", "num_tris", "num_prims")
)
def _hier_occlude_call(cols, prim_chunks, bounds, codes, root_code, stack_size,
                       num_tris, num_prims):
    g = cols[0].shape[0]
    kernel = functools.partial(
        _hier_kernel,
        root_code=root_code,
        n_sub=HCHUNK // 128,
        has_tri=num_tris > 0,
        has_sph=num_prims > num_tris,
        any_hit=True,
    )
    ray_spec = pl.BlockSpec(
        (1, RAY_BLOCK // 128, 128), lambda i, b, c: (i, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[ray_spec] * 8 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=ray_spec,
        scratch_shapes=[
            pltpu.VMEM((2, 16, HCHUNK), jnp.float32),  # double buffer
            pltpu.SMEM((stack_size,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),  # (pending chunk, its buffer)
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    blocked = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, RAY_BLOCK // 128, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(bounds, codes, *cols, prim_chunks)
    return blocked.reshape(-1)


def _sorted_ignore(soa: HierSoA, ignore):
    ig = soa.inv_order[jnp.maximum(ignore, 0)]
    return jnp.where(ignore >= 0, ig, -1)


def intersect_hier(geom: FlatGeometry, soa: HierSoA, o, d, t_max, ignore) -> Hit:
    """Closest-hit via the hierarchical packet kernel. Same contract as
    intersect_pallas (Hit.prim in ORIGINAL prim ids)."""
    n = o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    cols = _ray_cols(o, d, t_max, _sorted_ignore(soa, ignore), n_pad)
    t, p, u, v = _hier_trace_call(
        cols, soa.prim_chunks, soa.bounds, soa.codes,
        soa.root_code, soa.stack_size, soa.num_tris, soa.num_prims,
    )
    t, p, u, v = t[:n], p[:n], u[:n], v[:n]
    # padded prims can never win (v0 at 1e30 / det 0), so p < num_prims
    sorted_id = jnp.clip(p, 0.0, soa.num_prims - 1).astype(jnp.int32)
    prim = jnp.where(p >= 0.0, soa.order[sorted_id], -1)
    found = prim >= 0
    uv = jnp.stack([u, v], axis=-1)
    return Hit(t=jnp.where(found, t, INF), prim=jnp.where(found, prim, -1), uv=uv)


def occlude_hier(geom: FlatGeometry, soa: HierSoA, o, d, t_max, ignore) -> jax.Array:
    n = o.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    cols = _ray_cols(o, d, t_max, _sorted_ignore(soa, ignore), n_pad)
    blocked = _hier_occlude_call(
        cols, soa.prim_chunks, soa.bounds, soa.codes,
        soa.root_code, soa.stack_size, soa.num_tris, soa.num_prims,
    )
    return blocked[:n] > 0.5
