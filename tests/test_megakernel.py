"""Physics/draw parity of the fused Pallas megakernel (ops/megakernel.py)
against the XLA wavefront (the sanctioned single-physics reference).

The megakernel replicates evaluation/integrators.path_step op-for-op in
component form; these tests pin per-sample agreement (interpret mode on
CPU, both paths forced through the same pallas intersector so the only
differences are float reduction orders). Any physics change must keep
these green — see the invariant note in ops/megakernel.py."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.evaluation import scene_ops
from echorenderer_tpu.evaluation.wavefront import sample_frame_wavefront
from echorenderer_tpu.models import scenes
from echorenderer_tpu.ops.megakernel import sample_frame_mega, supported
from echorenderer_tpu.scene.prepare import prepare_scene


@pytest.fixture
def same_intersector(monkeypatch):
    # route the XLA wavefront through the (interpreted) pallas kernel so hit
    # records match the megakernel's bit-for-bit
    monkeypatch.setattr(
        scene_ops, "_use_pallas", lambda scene: scene.prim_soa is not None
    )


def _compare(scene, count=2, bounce_limit=3, seed=11):
    n = 1024  # one ray block
    res = (32, 32)
    pixel_id = jnp.arange(n, dtype=jnp.uint32)
    pixel_xy = jnp.stack(
        [(pixel_id % res[0]).astype(jnp.int32), (pixel_id // res[0]).astype(jnp.int32)],
        -1,
    )
    kw = dict(bounce_limit=bounce_limit, survivability=2.5)
    a, a2 = sample_frame_wavefront(
        scene, pixel_id, pixel_xy, res, seed, jnp.uint32(0), count, **kw
    )
    b, b2 = sample_frame_mega(
        scene, pixel_id, pixel_xy, res, seed, jnp.uint32(0), count, **kw
    )
    a, b = np.asarray(a), np.asarray(b)
    # per-sample agreement: identical draws and physics, differing only in
    # float reduction order (no Russian-roulette divergence tolerated here)
    np.testing.assert_allclose(b, a, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(a2), atol=4e-2, rtol=2e-3)
    # estimator-level: mean images essentially equal
    np.testing.assert_allclose(b.mean(0), a.mean(0), atol=1e-5, rtol=1e-5)


def test_mega_matches_wavefront_sphere_field(same_intersector):
    scene = prepare_scene(scenes.sphere_field(12))
    assert supported(scene)
    _compare(scene)


def test_mega_matches_wavefront_material_ball(same_intersector):
    # covers dielectric (smooth+rough), conductor, coated, emissive, ambient
    scene = prepare_scene(scenes.material_ball())
    assert supported(scene)
    _compare(scene)


def test_mega_matches_wavefront_light_tree(same_intersector):
    """Estevez-Kulla tree scenes (>= LIGHT_TREE_THRESHOLD finite lights)
    run in-kernel: probabilistic descent + forward-MIS replay must produce
    the same draws as scene_ops.pick_light/light_pmf (VERDICT r2 #5)."""
    scene = prepare_scene(scenes.many_lights(96))
    assert scene.lights.tree is not None
    assert supported(scene)
    _compare(scene)


def test_mega_unsupported_scenes_fall_back():
    # env-mapped scene: outside the megakernel envelope
    scene = prepare_scene(scenes.hdr_environment(resolution=(16, 8)))
    assert not supported(scene)


def test_mega_hier_matches_dense():
    """The fat-chunk hierarchical megakernel produces the same samples as
    the dense (VMEM-resident) megakernel: identical draws/physics, only the
    traversal differs (config #5's large-scene path, interpret mode)."""
    from echorenderer_tpu.aggregation.bvh import build_bvh, geometry_bounds
    from echorenderer_tpu.ops.megakernel import supported_hier
    from echorenderer_tpu.ops.pallas_hier import build_hier_soa

    scene = prepare_scene(scenes.sphere_field(300, seed=7))
    assert supported(scene)
    # scenes this small don't get hier tables from prepare; build directly
    geom = scene.geometry
    bmin, bmax = geometry_bounds(
        {k: np.asarray(v) for k, v in geom._asdict().items()}
    )
    bvh = build_bvh(bmin, bmax)
    hier = build_hier_soa(geom, np.asarray(bvh.prim_order))
    scene_h = scene._replace(hier_soa=hier)
    assert supported_hier(scene_h)

    n = 1024
    res = (32, 32)
    pixel_id = jnp.arange(n, dtype=jnp.uint32)
    pixel_xy = jnp.stack(
        [(pixel_id % res[0]).astype(jnp.int32), (pixel_id // res[0]).astype(jnp.int32)],
        -1,
    )
    kw = dict(bounce_limit=3, survivability=2.5)
    a, a2 = sample_frame_mega(
        scene, pixel_id, pixel_xy, res, 11, jnp.uint32(0), 2, **kw
    )
    b, b2 = sample_frame_mega(
        scene_h, pixel_id, pixel_xy, res, 11, jnp.uint32(0), 2, hier=True, **kw
    )
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(a2), atol=4e-2, rtol=2e-3)


def _textured_scene():
    """Small textured scene inside the megakernel envelope: procedural
    albedo textures (cloud + gradient) on a plane and a box, plus an
    untextured emissive — exercises the in-kernel bilinear fetch over the
    shared quantized atlas (VERDICT r3 #4)."""
    from echorenderer_tpu.scene import (
        BoxEntity, Diffuse, Emissive, PerspectiveCamera, PlaneEntity, Scene,
    )
    from echorenderer_tpu.textures.grids import GradientTexture
    from echorenderer_tpu.textures.procedural import CloudTexture

    scene = Scene()
    scene.add(PlaneEntity(
        size=(10, 10),
        material=Diffuse(albedo=CloudTexture(scale=4.0, seed=5)),
    ))
    scene.add(BoxEntity(
        size=(1.5, 2.0, 1.5), position=(0, 1.0, 1.0),
        material=Diffuse(albedo=GradientTexture(
            start=(0.1, 0.2, 0.7), end=(0.9, 0.8, 0.3), axis=1)),
    ))
    scene.add(PlaneEntity(
        size=(3, 3), material=Emissive(albedo=(12.0, 11.0, 10.0)),
        position=(0, 6, 0), rotation=(180, 0, 0),
    ))
    cam = PerspectiveCamera(field_of_view=45.0, position=(0, 2.5, -6))
    cam.look_at((0, 1, 0))
    scene.add(cam)
    return prepare_scene(scene)


def test_mega_matches_wavefront_textured(same_intersector):
    scene = _textured_scene()
    assert scene.tex_atlas.shape[0] >= 2
    assert supported(scene)  # textures no longer exclude the megakernel
    _compare(scene)


def test_mega_matches_wavefront_sphere_texture(same_intersector):
    """Equirect sphere uv + texture fetch in-kernel (arccos/arctan2 path)."""
    from echorenderer_tpu.scene import (
        Diffuse, Emissive, PerspectiveCamera, PlaneEntity, Scene, SphereEntity,
    )
    from echorenderer_tpu.textures.grids import GradientTexture

    scene = Scene()
    scene.add(SphereEntity(
        radius=1.0, position=(0, 1, 0),
        material=Diffuse(albedo=GradientTexture(
            start=(0.8, 0.1, 0.1), end=(0.1, 0.1, 0.8), axis=0)),
    ))
    scene.add(PlaneEntity(size=(8, 8), material=Diffuse(albedo=(0.6, 0.6, 0.6))))
    scene.add(PlaneEntity(
        size=(2, 2), material=Emissive(albedo=(15.0, 14.0, 13.0)),
        position=(0, 5, 0), rotation=(180, 0, 0),
    ))
    cam = PerspectiveCamera(field_of_view=45.0, position=(0, 2, -5))
    cam.look_at((0, 1, 0))
    scene.add(cam)
    prepared = prepare_scene(scene)
    assert prepared.tex_atlas.shape[0] >= 1
    assert supported(prepared)
    _compare(prepared)


def test_mega_k_slots_parity(same_intersector):
    """K-slot regeneration (each lane serves K pixels back to back to
    average the per-block tail) must leave per-pixel sums unchanged:
    identity switches slots, draws key on (pixel, sample, dim)."""
    scene = prepare_scene(scenes.sphere_field(12))
    n = 2048
    res = (64, 32)
    pixel_id = jnp.arange(n, dtype=jnp.uint32)
    pixel_xy = jnp.stack(
        [(pixel_id % res[0]).astype(jnp.int32),
         (pixel_id // res[0]).astype(jnp.int32)], -1)
    kw = dict(bounce_limit=3, survivability=2.5)
    a, a2 = sample_frame_mega(
        scene, pixel_id, pixel_xy, res, 7, jnp.uint32(0), 2, k_slots=1, **kw)
    b, b2 = sample_frame_mega(
        scene, pixel_id, pixel_xy, res, 7, jnp.uint32(0), 2, k_slots=2, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
    # and an uneven split exercising the switch-to-padding end condition
    c, _ = sample_frame_mega(
        scene, pixel_id[:1500], pixel_xy[:1500], res, 7, jnp.uint32(0), 2,
        k_slots=2, **kw)
    np.testing.assert_array_equal(np.asarray(a)[:1500], np.asarray(c))
