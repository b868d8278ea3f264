"""Light hierarchy for many-light importance sampling.

Rebuild of the reference's light tree (Aggregation/Selection/LightTree.cs:20,
Estevez & Kulla 2018 "Importance Sampling of Many Lights with Adaptive Tree
Splitting"): a binary tree over finite light records built with a
surface-area-orientation-heuristic sweep, flattened to SoA arrays for a
fixed-depth probabilistic descent on device. Infinite lights (ambient,
directional) are split off by power before the tree is consulted, exactly
as the reference does (PreparedScene.cs:317-325).

Per-light bound (reference Aggregation/Bounds/LightBound.cs:30):
  center/radius  spatial bounding sphere
  axis           principal emission direction (normal cone axis)
  cos_theta_o    emission normal-cone half angle (cos)
  cos_theta_e    emission falloff angle beyond theta_o (cos)
  power          total emitted power (luminance-weighted)

TPU layout: all per-node data for BOTH children lives in one packed
(K, 24) row — center(3) radius axis(3) cos_o cos_e power is_leaf index per
child — so each descent level costs exactly ONE gather (the analogue of
the reference's 128-byte cache-line QBVH nodes). The descent loop bound is
the tree's true depth, a static host-side int.

Device descent: at every interior node compute both children's importance
for the shading point (power x angular falloff / distance^2), pick one
proportionally, multiply the pmf, repeat to a leaf. The per-light path
bitmask lets `pmf_of_light` recompute the same product for MIS — the
analogue of the reference's token -> branch-bitmask map (LightTree.cs:26-37).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_F = 12  # packed floats per child


class FlatLightTree(NamedTuple):
    """Flattened binary light tree (device). nodes[i] packs both children:
    [cx cy cz r ax ay az cos_o cos_e power is_leaf index] x 2."""

    nodes: jax.Array  # (K, 24) float32
    light_path: jax.Array  # (L,) uint32 branch bitmask root->leaf
    light_depth: jax.Array  # (L,) int32 leaf depth
    max_depth: int  # static descent bound

    @property
    def size(self) -> int:
        return self.nodes.shape[0]


jax.tree_util.register_pytree_node(
    FlatLightTree,
    lambda t: ((t.nodes, t.light_path, t.light_depth), t.max_depth),
    lambda aux, xs: FlatLightTree(*xs, aux),
)


def build_light_tree(
    center: np.ndarray,  # (L, 3)
    radius: np.ndarray,  # (L,)
    axis: np.ndarray,  # (L, 3)
    theta_o: np.ndarray,  # (L,) emission cone half angle
    theta_e: np.ndarray,  # (L,) falloff angle
    power: np.ndarray,  # (L,)
) -> FlatLightTree:
    """Host SAOH sweep build (LightTree.cs:62-90 strategy: sort on the
    major axis of centroid bounds, sweep the power x area x orientation
    cost, split at the minimum)."""
    n = center.shape[0]
    assert n > 0
    center = np.asarray(center, np.float64)
    radius = np.asarray(radius, np.float64)
    axis = np.asarray(axis, np.float64)
    theta_o = np.asarray(theta_o, np.float64)
    theta_e = np.asarray(theta_e, np.float64)
    power = np.maximum(np.asarray(power, np.float64), 1e-12)

    rows: list[np.ndarray] = []
    light_path = np.zeros(n, np.uint32)
    light_depth = np.zeros(n, np.int32)

    def cluster_bound(idx):
        """Merge light bounds: bounding sphere of spheres + merged cone."""
        c = center[idx]
        r = radius[idx]
        lo = (c - r[:, None]).min(0)
        hi = (c + r[:, None]).max(0)
        cc = (lo + hi) / 2
        cr = float(np.max(np.linalg.norm(c - cc, axis=-1) + r))
        # merged orientation cone: power-weighted mean axis, widened by the
        # max deviation (conservative, cheaper than the exact cone union)
        w = power[idx][:, None]
        mean_axis = (axis[idx] * w).sum(0)
        norm = np.linalg.norm(mean_axis)
        if norm < 1e-9:
            return cc, cr, np.array([0.0, 0.0, 1.0]), np.pi, np.pi / 2
        mean_axis = mean_axis / norm
        dots = np.clip(axis[idx] @ mean_axis, -1.0, 1.0)
        spread = np.arccos(dots) + theta_o[idx]
        to = min(float(spread.max()), np.pi)
        te = float(theta_e[idx].max())
        return cc, cr, mean_axis, to, te

    def orientation_measure(to, te):
        """Angular measure M_omega of the cone (Estevez-Kulla eq. 1)."""
        tw = min(to + te, np.pi)
        s, c = np.sin(to), np.cos(to)
        return 2 * np.pi * (1 - c) + np.pi / 2 * (
            2 * tw * s - np.cos(to - 2 * tw) - 2 * to * s + c
        )

    def cluster_cost(idx):
        cc, cr, ax, to, te = cluster_bound(idx)
        lo = (center[idx] - radius[idx][:, None]).min(0)
        hi = (center[idx] + radius[idx][:, None]).max(0)
        e = np.maximum(hi - lo, 1e-9)
        area = e[0] * e[1] + e[1] * e[2] + e[2] * e[0]
        return power[idx].sum() * area * orientation_measure(to, te)

    def child_cols(bound, leaf, index):
        cc, cr, ax, to, te = bound
        return np.asarray(
            [*cc, cr, *ax, np.cos(to), np.cos(te), 0.0, float(leaf), float(index)],
            np.float64,
        )

    def recurse(idx: np.ndarray, depth: int, path: int):
        if len(idx) == 1:
            light_path[idx[0]] = path
            light_depth[idx[0]] = depth
            return ("leaf", int(idx[0]))
        lo = center[idx].min(0)
        hi = center[idx].max(0)
        ax = int(np.argmax(hi - lo))
        order = idx[np.argsort(center[idx, ax], kind="stable")]
        best_cost, best_split = np.inf, len(order) // 2
        if len(order) <= 32:  # full sweep for small clusters
            for split in range(1, len(order)):
                cost = cluster_cost(order[:split]) + cluster_cost(order[split:])
                if cost < best_cost:
                    best_cost, best_split = cost, split
        node_slot = len(rows)
        rows.append(None)  # reserve
        left = recurse(order[:best_split], depth + 1, path)
        right = recurse(order[best_split:], depth + 1, path | (1 << depth))
        row = np.zeros(2 * _F, np.float64)
        for side, res, sel in ((0, left, order[:best_split]), (1, right, order[best_split:])):
            col = child_cols(cluster_bound(sel), res[0] == "leaf", res[1])
            col[9] = power[sel].sum()
            row[side * _F : (side + 1) * _F] = col
        rows[node_slot] = row
        return ("node", node_slot)

    if n == 1:
        row = np.zeros(2 * _F, np.float64)
        col = child_cols(cluster_bound(np.asarray([0])), True, 0)
        col[9] = power[0]
        row[:_F] = col
        row[_F:] = col
        row[_F + 9] = 0.0  # right child weightless
        rows.append(row)
        light_depth[0] = 1
    else:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 10000 + 2 * n))
        try:
            recurse(np.arange(n), 0, 0)
        finally:
            sys.setrecursionlimit(old)

    return FlatLightTree(
        nodes=jnp.asarray(np.stack(rows).astype(np.float32)),
        light_path=jnp.asarray(light_path),
        light_depth=jnp.asarray(light_depth),
        max_depth=int(light_depth.max()),
    )


def _child_importance(row, x):
    """Importance of both children packed in `row` (N, 24) as seen from
    points x (N, 3): power * cos(theta') / d'^2 with the Estevez-Kulla
    uncertainty-angle falloff (LightBound.Importance, LightBound.cs:30)."""
    r2 = row.reshape(row.shape[0], 2, _F)
    c = r2[..., 0:3]
    r = r2[..., 3]
    ax = r2[..., 4:7]
    cos_o = r2[..., 7]
    cos_e = r2[..., 8]
    pw = r2[..., 9]

    delta = c - x[:, None, :]  # (N, 2, 3)
    d2 = jnp.sum(delta * delta, axis=-1)
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))
    wi = delta / d[..., None]

    # all angle arithmetic in cos/sin space (no arccos/arcsin/cos calls —
    # they dominated the descent cost on the VPU): for angles in [0, pi],
    # theta' = max(theta - (theta_o + theta_u), 0) and the comparisons
    # theta' > 0, theta' < theta_e reduce to products of cos/sin pairs.
    cos_i = jnp.clip(jnp.sum(ax * (-wi), axis=-1), -1.0, 1.0)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
    cos_o = jnp.clip(cos_o, -1.0, 1.0)
    sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))
    sin_u = jnp.clip(r / d, 0.0, 1.0)  # uncertainty from cluster extent
    cos_u = jnp.sqrt(jnp.maximum(1.0 - sin_u * sin_u, 0.0))
    # cos/sin of (theta_o + theta_u)
    cos_ou = cos_o * cos_u - sin_o * sin_u
    sin_ou = sin_o * cos_u + cos_o * sin_u
    sum_ge_pi = cos_o <= -cos_u  # theta_o + theta_u >= pi -> theta' = 0
    # cos(theta - (theta_o + theta_u))
    cos_p = cos_i * cos_ou + sin_i * sin_ou
    inside = sum_ge_pi | (cos_i >= cos_ou)  # theta' <= 0
    cos_p_eff = jnp.where(inside, 1.0, cos_p)
    falloff = jnp.where(cos_p_eff >= cos_e, jnp.maximum(cos_p_eff, 0.0), 0.0)
    d2c = jnp.maximum(d2, (0.5 * r) ** 2)  # clamp inside-cluster blowup
    imp = pw * falloff / d2c
    # keep strictly positive so pmfs never vanish for reachable lights
    return imp + pw * 1e-9


def pick(tree: FlatLightTree, x, u):
    """Descend the tree for shading points x (N, 3) with u (N,) in [0,1).
    Returns (light record id (N,), pmf (N,))."""
    n = x.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    pmf = jnp.ones((n,), jnp.float32)
    out = jnp.full((n,), -1, jnp.int32)
    uu = u

    def body(_, state):
        node, pmf, out, uu = state
        live = out < 0
        row = tree.nodes[jnp.maximum(node, 0)]  # one gather per level
        imp = _child_importance(row, x)  # (N, 2)
        total = jnp.maximum(imp.sum(-1), 1e-30)
        p_left = imp[:, 0] / total
        go_right = uu >= p_left
        p_pick = jnp.where(go_right, 1.0 - p_left, p_left)
        # rescale u within the chosen branch (sample reuse, Sample1D.Range)
        uu_next = jnp.where(
            go_right,
            (uu - p_left) / jnp.maximum(1.0 - p_left, 1e-12),
            uu / jnp.maximum(p_left, 1e-12),
        )
        uu_next = jnp.clip(uu_next, 0.0, 1.0 - 1e-7)
        side = go_right.astype(jnp.int32)
        meta = jnp.take_along_axis(
            row.reshape(n, 2, _F)[..., 10:12], side[:, None, None], 1
        )[:, 0]
        is_leaf = meta[..., 0] > 0.5
        nxt = meta[..., 1].astype(jnp.int32)
        new_pmf = jnp.where(live, pmf * p_pick, pmf)
        new_out = jnp.where(live & is_leaf, nxt, out)
        new_node = jnp.where(live & ~is_leaf, nxt, node)
        return new_node, new_pmf, new_out, jnp.where(live, uu_next, uu)

    node, pmf, out, uu = jax.lax.fori_loop(
        0, tree.max_depth, body, (node, pmf, out, uu)
    )
    return jnp.maximum(out, 0), pmf


def pmf_of_light(tree: FlatLightTree, light, x):
    """Probability that `pick` selects light record `light` (N,) from
    shading points x (N, 3) — replays the branch decisions recorded in the
    per-light path bitmask."""
    n = x.shape[0]
    light_c = jnp.maximum(light, 0)
    path = tree.light_path[light_c]
    depth = tree.light_depth[light_c]
    node = jnp.zeros((n,), jnp.int32)
    pmf = jnp.ones((n,), jnp.float32)

    def body(d, state):
        node, pmf = state
        live = d < depth
        row = tree.nodes[node]
        imp = _child_importance(row, x)
        total = jnp.maximum(imp.sum(-1), 1e-30)
        go_right = ((path >> d) & 1).astype(bool)
        p = jnp.where(go_right, imp[:, 1], imp[:, 0]) / total
        side = go_right.astype(jnp.int32)
        nxt = (
            jnp.take_along_axis(row.reshape(n, 2, _F)[..., 11], side[:, None], 1)[:, 0]
        ).astype(jnp.int32)
        return (
            jnp.where(live, nxt, node),
            jnp.where(live, pmf * p, pmf),
        )

    _, pmf = jax.lax.fori_loop(0, tree.max_depth, body, (node, pmf))
    return jnp.where(light >= 0, pmf, 0.0)
