"""Vector math on trailing-axis-3 jnp arrays (SoA-friendly).

TPU-native replacement for the reference's 4-wide SIMD structs
(Echo.Core/Common/Packed/Float3.cs, Float4.cs) and math helpers
(Common/Mathematics/FastMath.cs, Primitives/OrthonormalTransform.cs).
On TPU the VPU is 8x128 wide, so instead of packing one vector into one
SIMD register we keep arrays of shape (..., 3) and let XLA vectorize
across the batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = 8e-7  # reference FastMath.Epsilon (Common/Mathematics/FastMath.cs)


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Dot product over the trailing axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def dotk(a: jax.Array, b: jax.Array) -> jax.Array:
    """Dot product over the trailing axis, keepdims kept."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.cross(a, b)


def length_squared(a: jax.Array) -> jax.Array:
    return jnp.sum(a * a, axis=-1)


def length(a: jax.Array) -> jax.Array:
    return jnp.sqrt(length_squared(a))


def normalize(a: jax.Array) -> jax.Array:
    """Normalize over the trailing axis; zero vectors map to zero."""
    sq = jnp.sum(a * a, axis=-1, keepdims=True)
    inv = jnp.where(sq > 0.0, jax.lax.rsqrt(jnp.maximum(sq, 1e-38)), 0.0)
    return a * inv


def safe_sqrt(x: jax.Array) -> jax.Array:
    """sqrt clamped to non-negative input (reference FastMath.Sqrt0)."""
    return jnp.sqrt(jnp.maximum(x, 0.0))


def reflect(incident: jax.Array, normal: jax.Array) -> jax.Array:
    """Reflect `incident` about `normal` (both pointing away from surface,
    local shading convention: returns 2*dot(i,n)*n - i)."""
    return 2.0 * dotk(incident, normal) * normal - incident


def orthonormal_frame(normal: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Build a right-handed orthonormal basis (tangent, bitangent) around a
    unit `normal`. Branchless construction (Duff et al. 2017, "Building an
    Orthonormal Basis, Revisited") — the TPU analogue of the reference's
    OrthonormalTransform (Common/Mathematics/Primitives/OrthonormalTransform.cs:67).
    """
    n = normal
    sign = jnp.where(n[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2:3])
    b = n[..., 0:1] * n[..., 1:2] * a
    tangent = jnp.concatenate(
        [1.0 + sign * n[..., 0:1] ** 2 * a, sign * b, -sign * n[..., 0:1]], axis=-1
    )
    bitangent = jnp.concatenate(
        [b, sign + n[..., 1:2] ** 2 * a, -n[..., 1:2]], axis=-1
    )
    return tangent, bitangent


def to_local(v: jax.Array, tangent: jax.Array, bitangent: jax.Array, normal: jax.Array) -> jax.Array:
    """World -> local shading frame (z = normal)."""
    return jnp.stack([dot(v, tangent), dot(v, bitangent), dot(v, normal)], axis=-1)


def to_world(v: jax.Array, tangent: jax.Array, bitangent: jax.Array, normal: jax.Array) -> jax.Array:
    """Local shading frame -> world."""
    return (
        v[..., 0:1] * tangent + v[..., 1:2] * bitangent + v[..., 2:3] * normal
    )


# --- local-frame helpers (z-up shading space, reference BxDF.cs conventions) ---

def cos_theta(w: jax.Array) -> jax.Array:
    return w[..., 2]


def abs_cos_theta(w: jax.Array) -> jax.Array:
    return jnp.abs(w[..., 2])


def cos2_theta(w: jax.Array) -> jax.Array:
    return w[..., 2] * w[..., 2]


def sin2_theta(w: jax.Array) -> jax.Array:
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def same_hemisphere(a: jax.Array, b: jax.Array) -> jax.Array:
    return a[..., 2] * b[..., 2] > 0.0


def spherical_direction(sin_t: jax.Array, cos_t: jax.Array, phi: jax.Array) -> jax.Array:
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)


# --- 4x4 transforms (reference Common/Mathematics/Primitives/Float4x4.cs) ---

def transform_point(m: jax.Array, p: jax.Array) -> jax.Array:
    """Apply a (..., 4, 4) affine matrix to (..., 3) points."""
    return (
        jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]
    )


def transform_direction(m: jax.Array, d: jax.Array) -> jax.Array:
    """Apply the linear part of a (..., 4, 4) matrix to (..., 3) directions."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], d)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (x, y, z, w) -> 3x3 rotation matrix.

    The reference stores rotations as `Versor` (Common/Mathematics/Primitives/Versor.cs).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def euler_to_quaternion(angles_deg) -> jnp.ndarray:
    """XYZ extrinsic Euler angles in degrees -> unit quaternion (x, y, z, w).

    Matches the reference's `Versor(Float3 angles)` pitch/yaw/roll convention
    (Common/Mathematics/Primitives/Versor.cs): rotation about X (pitch), then
    Y (yaw), then Z (roll), applied in local-to-world order Y*X*Z.
    """
    import numpy as np

    pitch, yaw, roll = [np.radians(float(a)) * 0.5 for a in angles_deg]
    sx, cx = np.sin(pitch), np.cos(pitch)
    sy, cy = np.sin(yaw), np.cos(yaw)
    sz, cz = np.sin(roll), np.cos(roll)
    # q = qy * qx * qz  (yaw around Y, then pitch around X, then roll around Z)
    qx = np.array([sx, 0.0, 0.0, cx])
    qy = np.array([0.0, sy, 0.0, cy])
    qz = np.array([0.0, 0.0, sz, cz])

    def mul(a, b):
        ax, ay, az, aw = a
        bx, by, bz, bw = b
        return np.array(
            [
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
                aw * bw - ax * bx - ay * by - az * bz,
            ]
        )

    q = mul(mul(qy, qx), qz)
    return jnp.asarray(q / np.linalg.norm(q), dtype=jnp.float32)


def kahan_sum(values, axis=0):
    """Compensated (Kahan-Neumaier) summation along an axis — the numerical
    role of the reference's `Summation` struct (Common/Mathematics/
    Primitives/Summation.cs:58, used by its Accumulator). Implemented as a
    scan so XLA keeps the compensation term in registers."""
    import jax

    values = jnp.moveaxis(jnp.asarray(values), axis, 0)

    def step(carry, v):
        total, comp = carry
        t = total + v
        # Neumaier: pick the compensation branch by magnitude
        comp = comp + jnp.where(
            jnp.abs(total) >= jnp.abs(v), (total - t) + v, (v - t) + total
        )
        return (t, comp), None

    (total, comp), _ = jax.lax.scan(
        step, (jnp.zeros_like(values[0]), jnp.zeros_like(values[0])), values
    )
    return total + comp


def small_table_lookup(table, idx, *, max_rows: int = 2048):
    """Gather rows of a SMALL table by index — as a one-hot matmul on the
    MXU. TPU row-gathers from small tables run at ~1-2 GiB/s (scalar row
    copies); a (N, K) one-hot times (K, D) table runs at matmul speed and
    is exact (one-hot entries are exact in bfloat16, each output sums one
    product). Falls back to a plain gather for big tables, where gathers
    amortize properly."""
    table = jnp.asarray(table)
    squeeze = table.ndim == 1
    t2 = table[:, None] if squeeze else table
    k = t2.shape[0]
    if k > max_rows or idx.shape[0] < 4096:
        out = table[idx]
        return out
    import jax

    onehot = (
        idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    ).astype(jnp.float32)  # f32: bf16 would downcast the table operand
    vals = jnp.dot(
        onehot, t2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact (bit-equal to a gather)
    )
    if jnp.issubdtype(table.dtype, jnp.integer):
        vals = jnp.round(vals).astype(table.dtype)
    else:
        vals = vals.astype(table.dtype)
    return vals[:, 0] if squeeze else vals
