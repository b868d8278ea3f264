"""Texture-valued material roughness (reference materials accept
Texture-typed .Roughness, e.g. bunny.echo's Conductor): packed as an atlas
id and sampled per contact in interact()."""

import jax.numpy as jnp
import numpy as np

from echorenderer_tpu.evaluation import scene_ops
from echorenderer_tpu.scene import (
    AmbientLight,
    PerspectiveCamera,
    PlaneEntity,
    Scene,
)
from echorenderer_tpu.scene.materials import Conductor
from echorenderer_tpu.scene.prepare import prepare_scene
from echorenderer_tpu.textures.grids import ArrayGrid


def _gradient_tex():
    # horizontal 0 -> 1 roughness ramp
    data = np.linspace(0.0, 1.0, 64, dtype=np.float32)
    return ArrayGrid(np.tile(data[None, :, None], (64, 1, 3)))


def test_roughness_texture_varies_per_contact():
    scene = Scene()
    tex = _gradient_tex()
    scene.add(PlaneEntity(size=(2, 2), material=Conductor(roughness=tex)))
    scene.add(AmbientLight(intensity=(1, 1, 1)))
    scene.add(PerspectiveCamera(position=(0, 2, 0), rotation=(90, 0, 0)))
    prepared = prepare_scene(scene)

    assert int(prepared.mat_pack[0, 15]) >= 0 or int(prepared.mat_pack[1, 15]) >= 0

    # rays straight down onto the plane at increasing u
    n = 8
    xs = np.linspace(-0.9, 0.9, n, dtype=np.float32)
    o = jnp.asarray(np.stack([xs, np.full(n, 1.0, np.float32), np.zeros(n, np.float32)], -1))
    d = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32), (n, 1))
    hit = scene_ops.trace(prepared, o, d, jnp.full((n,), 10.0), jnp.full((n,), -1, jnp.int32))
    assert bool(hit.found.all())
    contact = scene_ops.interact(prepared, hit, o, d)
    rough = np.asarray(contact.material.params[:, 0])
    # monotone ramp across the plane (direction depends on uv orientation)
    assert rough.max() - rough.min() > 0.5
    diffs = np.diff(rough)
    assert (diffs >= -1e-3).all() or (diffs <= 1e-3).all()


def test_constant_roughness_unchanged():
    scene = Scene()
    scene.add(PlaneEntity(size=(2, 2), material=Conductor(roughness=0.3)))
    scene.add(AmbientLight(intensity=(1, 1, 1)))
    scene.add(PerspectiveCamera(position=(0, 2, 0), rotation=(90, 0, 0)))
    prepared = prepare_scene(scene)
    o = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    hit = scene_ops.trace(prepared, o, d, jnp.full((1,), 10.0), jnp.full((1,), -1, jnp.int32))
    contact = scene_ops.interact(prepared, hit, o, d)
    np.testing.assert_allclose(np.asarray(contact.material.params[0, 0]), 0.3, rtol=1e-5)
