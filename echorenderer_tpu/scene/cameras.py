"""Cameras: host-side description + batched device ray generation.

Rebuild of the reference camera layer (Scenic/Cameras/): horizontal
field-of-view perspective camera with thin-lens depth of field
(PerspectiveCamera.cs:15-63), orthographic, and 360° cylindrical cameras.
Image-plane convention matches RaySpawner.cs: x in [-1/2, 1/2], y scaled
proportionally by aspect; local forward is +z.
"""

from __future__ import annotations

import numpy as np

from .entities import Entity
from ..utils import rng as rng_mod

PERSPECTIVE = 0
ORTHOGRAPHIC = 1
CYLINDRICAL = 2


class Camera(Entity):
    kind = PERSPECTIVE

    def __init__(self, name=None, **kw):
        super().__init__(name=name, **kw)

    def pack(self, world: np.ndarray) -> dict:
        """Host -> device parameter dict used by spawn_rays."""
        rot = world[:3, :3].copy()
        scale = np.linalg.norm(rot[:, 0])
        rot /= max(scale, 1e-20)
        return dict(
            kind=self.kind,
            position=world[:3, 3].astype(np.float32),
            rotation=rot.astype(np.float32),
            forward_length=np.float32(1.0),
            lens_radius=np.float32(0.0),
            focal_distance=np.float32(0.0),
        )


class PerspectiveCamera(Camera):
    kind = PERSPECTIVE

    def __init__(self, field_of_view=65.0, lens_radius=0.0, focal_distance=0.0, **kw):
        super().__init__(**kw)
        self.field_of_view = float(field_of_view)  # horizontal, degrees
        self.lens_radius = float(lens_radius)
        self.focal_distance = float(focal_distance)

    def pack(self, world):
        p = super().pack(world)
        p["forward_length"] = np.float32(
            0.5 / np.tan(np.radians(self.field_of_view) / 2.0)
        )
        if self.lens_radius > 0.0 and self.focal_distance > 0.0:
            p["lens_radius"] = np.float32(self.lens_radius)
            p["focal_distance"] = np.float32(self.focal_distance)
        return p


class OrthographicCamera(Camera):
    kind = ORTHOGRAPHIC

    def __init__(self, width=1.0, **kw):
        super().__init__(**kw)
        self.width = float(width)

    def pack(self, world):
        p = super().pack(world)
        p["forward_length"] = np.float32(self.width)  # reused as view width
        return p


class CylindricalCamera(Camera):
    """360° panoramic camera (reference CylindricalCamera.cs)."""

    kind = CYLINDRICAL


def spawn_rays(cam, pixel_xy, shift, lens_u, resolution):
    """Generate camera rays for a batch of pixels (device-side).

    cam: PackedCamera (scene/prepare.py) with static `kind`
    pixel_xy: (N, 2) integer pixel coordinates (x right, y up)
    shift: (N, 2) in [0,1)^2 sub-pixel jitter
    lens_u: (N, 2) lens samples for depth of field
    resolution: static (width, height)
    Returns (origin (N,3), direction (N,3)).
    """
    import jax.numpy as jnp

    width, height = resolution
    size_r = 1.0 / jnp.float32(width)
    aspect_y = jnp.float32(height) / jnp.float32(width)

    xy = pixel_xy.astype(jnp.float32) + shift
    x = xy[..., 0] * size_r - 0.5
    y = xy[..., 1] * size_r - aspect_y * 0.5

    rot = cam.rotation  # (3, 3) local->world
    pos = cam.position
    kind = int(cam.kind)

    if kind == PERSPECTIVE:
        fl = cam.forward_length
        local_dir = jnp.stack([x, y, jnp.broadcast_to(fl, x.shape)], axis=-1)
        lens_radius = cam.lens_radius
        focal = cam.focal_distance
        has_dof = (lens_radius > 0.0) & (focal > 0.0)
        lens = rng_mod.concentric_disk(lens_u) * lens_radius
        focus_scale = focal / fl
        focus = jnp.stack(
            [x * focus_scale, y * focus_scale, jnp.broadcast_to(focal, x.shape)], axis=-1
        )
        local_origin = jnp.where(
            has_dof,
            jnp.concatenate([lens, jnp.zeros_like(lens[..., :1])], axis=-1),
            jnp.zeros_like(focus),
        )
        local_dir = jnp.where(has_dof, focus - local_origin, local_dir)
        origin = local_origin @ rot.T + pos
        direction = local_dir @ rot.T
    elif kind == ORTHOGRAPHIC:
        w = cam.forward_length
        local_origin = jnp.stack([x * w, y * w, jnp.zeros_like(x)], axis=-1)
        origin = local_origin @ rot.T + pos
        direction = jnp.broadcast_to(rot[:, 2], origin.shape)
    else:  # CYLINDRICAL: 360 pano, x -> azimuth, y -> elevation
        phi = (x + 0.5) * (2.0 * jnp.pi)
        theta = jnp.arctan2(y, jnp.float32(1.0))
        local_dir = jnp.stack(
            [jnp.sin(phi) * jnp.cos(theta), jnp.sin(theta), jnp.cos(phi) * jnp.cos(theta)],
            axis=-1,
        )
        origin = jnp.broadcast_to(pos, local_dir.shape)
        direction = local_dir @ rot.T

    norm = jnp.sqrt(jnp.sum(direction * direction, axis=-1, keepdims=True))
    return origin, direction / jnp.maximum(norm, 1e-20)
