"""Multiple textured infinite (ambient) lights — VERDICT r4 missing #5 /
next #8. The reference prepares every InfiniteLight independently
(PreparedScene.cs:317-325 splits power over ALL infinite lights;
AmbientLight.cs evaluates its own texture with its own rotation), so two
textured AmbientLights must (a) both contribute to escaped rays, (b) both
be importance-sampled by NEE with a correct mixture pdf (MIS stays
unbiased), and (c) honor per-light DirectlyVisible.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.scene import (
    AmbientLight,
    Diffuse,
    PerspectiveCamera,
    PlaneEntity,
    Scene,
    SphereEntity,
)
from echorenderer_tpu.scene.prepare import LIGHT_AMBIENT, prepare_scene
from echorenderer_tpu.textures.directional import CylindricalTexture


def _gradient_env(h=16, w=32, top=(2.0, 0.2, 0.2), bottom=(0.1, 0.1, 0.1)):
    v = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None, None]
    img = np.asarray(bottom, np.float32) * (1 - v) + np.asarray(top, np.float32) * v
    return np.broadcast_to(img, (h, w, 3)).copy()


def _two_env_scene(vis0=True, vis1=True, i0=(1, 1, 1), i1=(1, 1, 1)):
    s = Scene()
    s.add(
        SphereEntity(
            radius=0.7, material=Diffuse(albedo=(0.7, 0.7, 0.7)), position=(0, 0, 0)
        )
    )
    s.add(
        AmbientLight(
            intensity=i0,
            texture=CylindricalTexture(_gradient_env(top=(2.5, 0.3, 0.2))),
            directly_visible=vis0,
        )
    )
    s.add(
        AmbientLight(
            intensity=i1,
            texture=CylindricalTexture(_gradient_env(top=(0.2, 0.4, 2.5))),
            directly_visible=vis1,
            rotation=(0.0, 90.0, 0.0),
        )
    )
    cam = PerspectiveCamera(field_of_view=45.0, position=(0, 0.4, -2.4))
    cam.look_at((0, 0, 0))
    s.add(cam)
    return s


def test_two_env_records_and_eval():
    from echorenderer_tpu.evaluation import scene_ops

    prepared = prepare_scene(_two_env_scene())
    assert len(prepared.env_maps) == 2
    lt = prepared.lights
    assert int(jnp.sum(lt.kind == LIGHT_AMBIENT)) == 2  # two ambient records
    # eval_infinite must equal the sum of the two independent env evals
    d = jnp.asarray(
        [[0.0, 1.0, 0.0], [0.3, -0.8, 0.5], [1.0, 0.0, 0.0]], jnp.float32
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    total = scene_ops.eval_infinite(prepared, d, False)
    parts = 0.0
    for e, env in enumerate(prepared.env_maps):
        parts = parts + env.evaluate(d @ lt.env_rotation[e].T) * lt.env_scale[e]
    np.testing.assert_allclose(np.asarray(total), np.asarray(parts), rtol=1e-5)


def test_two_env_mixture_pdf_normalized():
    """The ambient mixture pdf must integrate to 1 over the sphere."""
    from echorenderer_tpu.evaluation import scene_ops
    from echorenderer_tpu.utils.rng import uniform_sphere

    prepared = prepare_scene(_two_env_scene(i0=(2, 2, 2)))
    u = np.random.default_rng(7).random((8192, 2)).astype(np.float32)
    d = uniform_sphere(jnp.asarray(u))
    pdf = scene_ops.env_pdf(prepared, d)
    integral = float(jnp.mean(pdf) * 4.0 * jnp.pi)
    assert abs(integral - 1.0) < 0.05, integral


def test_two_env_path_matches_naive():
    """NEE+MIS over the two-env mixture agrees with the naive estimator
    (the unbiasedness oracle — a wrong mixture pdf biases one of them)."""
    from echorenderer_tpu.processes.render import _sample_frame_jit

    prepared = prepare_scene(_two_env_scene())
    res, spp = (10, 8), 384
    path, _ = _sample_frame_jit(
        prepared, "path", res, 0, jnp.asarray(0, jnp.uint32), spp, 8, 2.5
    )
    naive, _ = _sample_frame_jit(
        prepared, "naive", res, 0, jnp.asarray(0, jnp.uint32), spp, 8, 2.5
    )
    p = np.asarray(path) / spp
    n = np.asarray(naive) / spp
    assert abs(p.mean() - n.mean()) / max(n.mean(), 1e-9) < 0.05, (
        p.mean(), n.mean(),
    )


def test_env_directly_visible_gating():
    """A DirectlyVisible=false env light vanishes from camera rays but
    still lights the scene (reference InfiniteLight.DirectlyVisible)."""
    from echorenderer_tpu.evaluation import scene_ops

    both = prepare_scene(_two_env_scene(vis0=True, vis1=False))
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    cam_rad = scene_ops.eval_infinite(both, d, True)
    all_rad = scene_ops.eval_infinite(both, d, False)
    lt = both.lights
    expect_cam = both.env_maps[0].evaluate(d @ lt.env_rotation[0].T) * lt.env_scale[0]
    np.testing.assert_allclose(np.asarray(cam_rad), np.asarray(expect_cam), rtol=1e-5)
    assert float(jnp.sum(all_rad)) > float(jnp.sum(cam_rad))


def test_env_plus_constant_ambient():
    """A textured env plus a constant ambient produce separate records and
    an unbiased combined estimate."""
    from echorenderer_tpu.processes.render import _sample_frame_jit

    s = _two_env_scene()
    s.add(AmbientLight(intensity=(0.3, 0.3, 0.3)))
    prepared = prepare_scene(s)
    assert int(jnp.sum(prepared.lights.kind == LIGHT_AMBIENT)) == 3
    assert prepared.lights.amb_const_power.shape == (1,)
    res, spp = (8, 6), 384
    path, _ = _sample_frame_jit(
        prepared, "path", res, 0, jnp.asarray(0, jnp.uint32), spp, 8, 2.5
    )
    naive, _ = _sample_frame_jit(
        prepared, "naive", res, 0, jnp.asarray(0, jnp.uint32), spp, 8, 2.5
    )
    p = np.asarray(path) / spp
    n = np.asarray(naive) / spp
    assert abs(p.mean() - n.mean()) / max(n.mean(), 1e-9) < 0.05, (
        p.mean(), n.mean(),
    )
