"""SAH bounding volume hierarchy: host-side build, device-side traversal.

Rebuild of the reference's acceleration layer (Aggregation/Acceleration/):
  - full-sweep SAH build on the major axis with parallel-friendly numpy
    prefix/suffix area scans (SweepBuilder.cs:14-80)
  - flattened SoA node arrays where each interior node stores BOTH child
    AABBs (the trick behind BoxBound4/QuadBoundingVolumeHierarchy.cs:406:
    a node's bounds live in its parent so one gather fetches everything
    needed to order the descent)
  - lockstep masked traversal: all rays advance together, each with a
    short stack in a fixed (N, DEPTH) array; finished lanes idle under
    masks. This replaces the reference's per-thread `unsafe` stack walk
    (QuadBoundingVolumeHierarchy.cs:121-315) with a form XLA can tile.

Leaf encoding in a child slot (int32):
  >= 0              : interior node index
  <  0              : leaf; bits = -(1 + (start << 4) + count), count <= 15
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.intersect import (
    INF,
    RAY_EPSILON,
    FlatGeometry,
    Hit,
    ray_sphere_roots,
    ray_triangle,
    sphere_pick_root,
)

LEAF_MAX = 4  # max primitives per leaf
STACK_DEPTH = 48


def _encode_leaf(start: int, count: int) -> int:
    assert 0 < count <= 15
    return -(1 + (start << 4) + count)


def _decode_leaf(code):
    bits = -(code + 1)
    return bits >> 4, bits & 15


class FlatBVH(NamedTuple):
    """Flattened binary BVH. Interior node i stores its children's bounds."""

    child_min: jax.Array  # (B, 2, 3)
    child_max: jax.Array  # (B, 2, 3)
    child_code: jax.Array  # (B, 2) int32 (interior index or leaf code)
    prim_order: jax.Array  # (P,) int32 leaf-contiguous primitive ids
    root_code: jax.Array  # () int32

    @property
    def num_nodes(self) -> int:
        return self.child_min.shape[0]


def build_bvh(aabb_min: np.ndarray, aabb_max: np.ndarray, leaf_max: int = LEAF_MAX,
              host_out: dict | None = None) -> FlatBVH:
    """Full-sweep SAH build over primitive AABBs (host).

    Follows the reference strategy (Acceleration/SweepBuilder.cs): sort by
    centroid on the major axis of the centroid bounds, scan prefix/suffix
    surface areas, split at the minimum SAH cost. Uses the native C++
    builder (native/bvh_builder.cpp) when available — the host-side hot
    path for multi-million-triangle scenes — with this numpy
    implementation as the fallback and the correctness oracle.

    `host_out`, when given, receives the NUMPY node arrays (child_min/
    child_max/child_code/prim_order/root_code). Downstream layout builders
    must read these instead of the FlatBVH's device arrays: each
    device->host readback costs ~15 s through the TPU tunnel regardless
    of size (measured: 7 such reads were ~85% of a 1M-tri prepare).
    """
    aabb_min = np.asarray(aabb_min, np.float32)
    aabb_max = np.asarray(aabb_max, np.float32)

    def stash(cmin, cmax, ccode, order, root):
        if host_out is not None:
            host_out.update(
                child_min=cmin, child_max=cmax, child_code=ccode,
                prim_order=order, root_code=root,
            )

    from ..native import build_bvh_native

    native = build_bvh_native(aabb_min, aabb_max, leaf_max)
    if native is not None:
        cmin, cmax, ccode, order, root = native
        stash(cmin, cmax, ccode, np.asarray(order, np.int32), int(root))
        return FlatBVH(
            child_min=jnp.asarray(cmin),
            child_max=jnp.asarray(cmax),
            child_code=jnp.asarray(ccode),
            prim_order=jnp.asarray(order),
            root_code=jnp.asarray(root, jnp.int32),
        )
    n = aabb_min.shape[0]
    assert n > 0
    centroids = (aabb_min + aabb_max) * 0.5

    child_min, child_max, child_code = [], [], []
    prim_order = []

    def half_area(bmin, bmax):
        e = np.maximum(bmax - bmin, 0.0)
        return e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0]

    def make_leaf(idx: np.ndarray) -> int:
        start = len(prim_order)
        prim_order.extend(int(i) for i in idx)
        return _encode_leaf(start, len(idx))

    def bounds_of(idx):
        return aabb_min[idx].min(0), aabb_max[idx].max(0)

    def recurse(idx: np.ndarray) -> tuple[int, np.ndarray, np.ndarray]:
        """Returns (code, bounds_min, bounds_max) for the subtree over idx."""
        bmin, bmax = bounds_of(idx)
        if len(idx) <= leaf_max:
            return make_leaf(idx), bmin, bmax

        cmin = centroids[idx].min(0)
        cmax = centroids[idx].max(0)
        axis = int(np.argmax(cmax - cmin))
        order = idx[np.argsort(centroids[idx, axis], kind="stable")]

        # prefix/suffix surface-area sweep
        mins, maxs = aabb_min[order], aabb_max[order]
        pre_min = np.minimum.accumulate(mins, 0)
        pre_max = np.maximum.accumulate(maxs, 0)
        suf_min = np.minimum.accumulate(mins[::-1], 0)[::-1]
        suf_max = np.maximum.accumulate(maxs[::-1], 0)[::-1]
        counts = np.arange(1, len(order), dtype=np.float32)
        cost = half_area(pre_min[:-1], pre_max[:-1]) * counts + half_area(
            suf_min[1:], suf_max[1:]
        ) * counts[::-1]
        split = int(np.argmin(cost)) + 1

        node = len(child_code)
        child_min.append(np.zeros((2, 3), np.float32))
        child_max.append(np.zeros((2, 3), np.float32))
        child_code.append(np.zeros(2, np.int32))

        lcode, lmin, lmax = recurse(order[:split])
        rcode, rmin, rmax = recurse(order[split:])
        child_min[node][0], child_max[node][0] = lmin, lmax
        child_min[node][1], child_max[node][1] = rmin, rmax
        child_code[node][0], child_code[node][1] = lcode, rcode
        return node, bmin, bmax

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000 + 2 * n))
    try:
        root_code, _, _ = recurse(np.arange(n))
    finally:
        sys.setrecursionlimit(old_limit)

    if not child_code:  # single leaf scene
        child_min.append(np.zeros((2, 3), np.float32))
        child_max.append(np.zeros((2, 3), np.float32))
        child_code.append(np.asarray([root_code, root_code], np.int32))

    stash(
        np.stack(child_min), np.stack(child_max), np.stack(child_code),
        np.asarray(prim_order, np.int32), int(root_code),
    )
    return FlatBVH(
        child_min=jnp.asarray(np.stack(child_min)),
        child_max=jnp.asarray(np.stack(child_max)),
        child_code=jnp.asarray(np.stack(child_code)),
        prim_order=jnp.asarray(np.asarray(prim_order, np.int32)),
        root_code=jnp.asarray(root_code, jnp.int32),
    )


def geometry_bounds(geom_np: dict) -> tuple[np.ndarray, np.ndarray]:
    """AABBs for the combined primitive index space of a FlatGeometry
    given as numpy arrays (host side, pre-upload)."""
    mins, maxs = [], []
    t = geom_np["tri_v0"].shape[0]
    if t:
        v0 = geom_np["tri_v0"]
        v1 = v0 + geom_np["tri_e1"]
        v2 = v0 + geom_np["tri_e2"]
        mins.append(np.minimum(np.minimum(v0, v1), v2))
        maxs.append(np.maximum(np.maximum(v0, v1), v2))
    s = geom_np["sph_center"].shape[0]
    if s:
        r = geom_np["sph_radius"][:, None]
        mins.append(geom_np["sph_center"] - r)
        maxs.append(geom_np["sph_center"] + r)
    return np.concatenate(mins, 0), np.concatenate(maxs, 0)


def _slab_test(o, inv_d, bmin, bmax, t_max):
    """Batched ray/AABB slab test. o, inv_d: (..., 3); returns (hit, t_near)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_near <= t_far) & (t_far > 0.0) & (t_near < t_max)
    return hit, jnp.maximum(t_near, 0.0)


def _leaf_intersect(geom: FlatGeometry, bvh: FlatBVH, o, d, code, best, any_hit_tmax=None):
    """Intersect the (masked) leaf `code` for every ray lane.

    best = (t, prim, uv) running closest hit. Returns updated best, or a
    boolean blocked mask when any_hit_tmax is given.
    """
    num_tri = geom.num_triangles
    start, count = _decode_leaf(code)
    is_leaf = code < 0
    blocked = jnp.zeros(o.shape[0], bool) if any_hit_tmax is not None else None
    best_t, best_prim, best_uv, ignore = best

    for i in range(LEAF_MAX):
        live = is_leaf & (i < count)
        slot = jnp.clip(start + i, 0, bvh.prim_order.shape[0] - 1)
        pid = bvh.prim_order[slot]
        is_tri = pid < num_tri

        # triangle candidate (clamped gather keeps indices in range)
        ti = jnp.clip(pid, 0, max(num_tri - 1, 0))
        if num_tri:
            t_t, u, v, tv = ray_triangle(
                o, d, geom.tri_v0[ti], geom.tri_e1[ti], geom.tri_e2[ti]
            )
        else:
            t_t = jnp.full(o.shape[0], INF)
            u = v = jnp.zeros(o.shape[0])
            tv = jnp.zeros(o.shape[0], bool)

        # sphere candidate — ignored spheres take the far root (findFar,
        # SphereEntity.cs:88); ignored triangles are skipped outright
        num_sph = geom.num_spheres
        si = jnp.clip(pid - num_tri, 0, max(num_sph - 1, 0))
        if num_sph:
            t_n, t_f, sok = ray_sphere_roots(
                o, d, geom.sph_center[si], geom.sph_radius[si]
            )
            t_s, sv = sphere_pick_root(t_n, t_f, sok, pid == ignore)
        else:
            t_s = jnp.full(o.shape[0], INF)
            sv = jnp.zeros(o.shape[0], bool)

        t = jnp.where(is_tri, t_t, t_s)
        valid = (
            live
            & jnp.where(is_tri, tv & (pid != ignore), sv)
            & (t > RAY_EPSILON)
        )

        if any_hit_tmax is not None:
            blocked |= valid & (t < any_hit_tmax)
        else:
            closer = valid & (t < best_t)
            uv = jnp.stack([u, v], axis=-1)  # sphere uv derived in interact()
            best_t = jnp.where(closer, t, best_t)
            best_prim = jnp.where(closer, pid, best_prim)
            best_uv = jnp.where(closer[:, None], uv, best_uv)

    if any_hit_tmax is not None:
        return blocked
    return best_t, best_prim, best_uv, ignore


def _traverse(geom: FlatGeometry, bvh: FlatBVH, o, d, t_max, ignore, any_hit: bool):
    """Lockstep stack traversal shared by trace (closest) and occlude (any)."""
    n = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    stack = stack.at[:, 0].set(bvh.root_code)
    sp = jnp.ones((n,), jnp.int32)

    best_t = t_max
    best_prim = jnp.full((n,), -1, jnp.int32)
    best_uv = jnp.zeros((n, 2), jnp.float32)
    blocked = jnp.zeros((n,), bool)

    def cond(state):
        sp, *_ = state
        alive = sp > 0
        if any_hit:
            alive &= ~state[5]
        return jnp.any(alive)

    def body(state):
        sp, stack, best_t, best_prim, best_uv, blocked = state
        active = sp > 0
        if any_hit:
            active &= ~blocked
        sp_idx = jnp.maximum(sp - 1, 0)
        # one-hot gather/scatter over the DEPTH axis: XLA:CPU compiles
        # elementwise selects orders of magnitude faster than real
        # scatters, and on TPU these are plain VPU ops
        lanes = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
        code = jnp.sum(jnp.where(lanes == sp_idx[:, None], stack, 0), axis=1)
        code = jnp.where(active, code, 0)
        sp = jnp.where(active, sp - 1, sp)

        is_interior = active & (code >= 0)
        node = jnp.clip(code, 0, bvh.num_nodes - 1)

        cmin = bvh.child_min[node]  # (N, 2, 3)
        cmax = bvh.child_max[node]
        ccode = bvh.child_code[node]  # (N, 2)
        limit = jnp.where(blocked, -INF, best_t) if any_hit else best_t
        hit, t_near = _slab_test(o[:, None, :], inv_d[:, None, :], cmin, cmax, limit[:, None])
        hit &= is_interior[:, None]

        # push the farther child first so the nearer is popped first
        near_first = t_near[:, 0] <= t_near[:, 1]
        first = jnp.where(near_first, ccode[:, 1], ccode[:, 0])
        first_hit = jnp.where(near_first, hit[:, 1], hit[:, 0])
        second = jnp.where(near_first, ccode[:, 0], ccode[:, 1])
        second_hit = jnp.where(near_first, hit[:, 0], hit[:, 1])

        for child, child_hit in ((first, first_hit), (second, second_hit)):
            idx = jnp.minimum(sp, STACK_DEPTH - 1)
            write = (lanes == idx[:, None]) & child_hit[:, None]
            stack = jnp.where(write, child[:, None], stack)
            sp = jnp.where(child_hit, sp + 1, sp)

        # leaf handling (masked)
        leaf_code = jnp.where(active & (code < 0), code, 0)
        if any_hit:
            new_blocked = _leaf_intersect(
                geom, bvh, o, d, leaf_code, (best_t, best_prim, best_uv, ignore), best_t
            )
            blocked |= new_blocked
        else:
            best_t, best_prim, best_uv, _ = _leaf_intersect(
                geom, bvh, o, d, leaf_code, (best_t, best_prim, best_uv, ignore)
            )
        return sp, stack, best_t, best_prim, best_uv, blocked

    state = (sp, stack, best_t, best_prim, best_uv, blocked)
    state = jax.lax.while_loop(cond, body, state)
    _, _, best_t, best_prim, best_uv, blocked = state
    if any_hit:
        return blocked
    return Hit(t=jnp.where(best_prim >= 0, best_t, INF), prim=best_prim, uv=best_uv)


def intersect_bvh(geom: FlatGeometry, bvh: FlatBVH, o, d, t_max, ignore) -> Hit:
    """Closest-hit traversal (reference Accelerator.Trace)."""
    return _traverse(geom, bvh, o, d, t_max, ignore, any_hit=False)


def trace_cost(geom: FlatGeometry, bvh: FlatBVH, o, d) -> jax.Array:
    """Per-ray traversal cost: node visits + primitive tests, the metric
    behind the reference's false-color AggregatorQualityEvaluator
    (Accelerator.TraceCost, Aggregation/Acceleration/Accelerator.cs:104)."""
    n = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    stack = stack.at[:, 0].set(bvh.root_code)
    sp = jnp.ones((n,), jnp.int32)
    cost = jnp.zeros((n,), jnp.float32)

    def cond(state):
        return jnp.any(state[0] > 0)

    def body(state):
        sp, stack, cost = state
        active = sp > 0
        sp_idx = jnp.maximum(sp - 1, 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
        code = jnp.sum(jnp.where(lanes == sp_idx[:, None], stack, 0), axis=1)
        code = jnp.where(active, code, 0)
        sp = jnp.where(active, sp - 1, sp)
        is_interior = active & (code >= 0)
        node = jnp.clip(code, 0, bvh.num_nodes - 1)
        cmin = bvh.child_min[node]
        cmax = bvh.child_max[node]
        ccode = bvh.child_code[node]
        hit, _ = _slab_test(o[:, None, :], inv_d[:, None, :], cmin, cmax, jnp.full((n, 1), INF))
        hit &= is_interior[:, None]
        for side in range(2):
            idx = jnp.minimum(sp, STACK_DEPTH - 1)
            write = (lanes == idx[:, None]) & hit[:, side][:, None]
            stack = jnp.where(write, ccode[:, side][:, None], stack)
            sp = jnp.where(hit[:, side], sp + 1, sp)
        # cost: 1 per interior node + LEAF_MAX per leaf visit (prim tests)
        cost += jnp.where(is_interior, 1.0, 0.0)
        cost += jnp.where(active & (code < 0), float(LEAF_MAX), 0.0)
        return sp, stack, cost

    _, _, cost = jax.lax.while_loop(cond, body, (sp, stack, cost))
    return cost


def occlude_bvh(geom: FlatGeometry, bvh: FlatBVH, o, d, t_max, ignore) -> jax.Array:
    """Any-hit traversal with early exit (reference Accelerator.Occlude)."""
    return _traverse(geom, bvh, o, d, t_max, ignore, any_hit=True)
