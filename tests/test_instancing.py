"""Pack instancing tests (reference Scenic/Hierarchies/PackInstance.cs,
EntityPackTests.cs). Instances currently bake their transforms at
preparation — same images as the reference's two-level traversal, traded
for memory (TLAS is on the roadmap)."""

import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.processes.render import (
    EvaluationProfile,
    RenderProfile,
    render,
)
from echorenderer_tpu.scene import (
    AmbientLight,
    Diffuse,
    EntityPack,
    PackInstance,
    PerspectiveCamera,
    Scene,
    SphereEntity,
)
from echorenderer_tpu.scene.materials import Emissive
from echorenderer_tpu.scene.prepare import prepare_scene


def _pack():
    pack = EntityPack()
    pack.add(SphereEntity(radius=0.5, material=Diffuse(albedo=(0.9, 0.2, 0.2))))
    pack.add(
        SphereEntity(
            radius=0.25, material=Diffuse(albedo=(0.2, 0.2, 0.9)), position=(0, 0.9, 0)
        )
    )
    return pack


class TestPackInstance:
    def test_instances_duplicate_geometry(self):
        scene = Scene()
        pack = _pack()
        scene.add(PackInstance(pack, position=(-1.5, 0, 0)))
        scene.add(PackInstance(pack, position=(1.5, 0, 0), scale=0.5))
        scene.add(PerspectiveCamera(position=(0, 0, -5)))
        prepared = prepare_scene(scene)
        assert prepared.geometry.num_spheres == 4  # 2 spheres x 2 instances

    def test_instance_transforms_apply(self):
        """Both instances appear in the image at their transformed places."""
        scene = Scene()
        pack = _pack()
        scene.add(PackInstance(pack, position=(-1.5, 0, 0)))
        scene.add(PackInstance(pack, position=(1.5, 0, 0)))
        scene.add(AmbientLight(intensity=(1, 1, 1)))
        cam = PerspectiveCamera(field_of_view=60, position=(0, 0, -4))
        cam.look_at((0, 0, 0))
        scene.add(cam)
        prepared = prepare_scene(scene)
        prof = RenderProfile(
            resolution=(48, 32),
            evaluations=(EvaluationProfile(evaluator="albedo", layer_name="a"),),
        )
        img = render(prepared, prof)["a"]
        left = img[:, :24]
        right = img[:, 24:]
        # a red sphere shows on each side
        assert (left[..., 0] > 0.5).any() and (right[..., 0] > 0.5).any()
        # and the halves mirror (same pack, mirrored placement); per-pixel
        # jitter differs so compare means, not exact pixels
        assert np.abs(left - right[:, ::-1]).mean() < 0.03

    def test_material_swatch_override(self):
        """Per-instance material swatches (reference MaterialSwatch)."""
        scene = Scene()
        pack = _pack()
        red = pack.children[0].material
        green = Diffuse(albedo=(0.1, 0.9, 0.1))
        scene.add(PackInstance(pack, position=(-1.5, 0, 0)))
        scene.add(
            PackInstance(pack, material_swatch={red: green}, position=(1.5, 0, 0))
        )
        cam = PerspectiveCamera(field_of_view=60, position=(0, 0, -4))
        cam.look_at((0, 0, 0))
        scene.add(cam)
        # dark ambient: the albedo AOV shows the env color on misses, which
        # must not trip the channel asserts below
        scene.add(AmbientLight(intensity=(0.01, 0.01, 0.01)))
        prepared = prepare_scene(scene)
        prof = RenderProfile(
            resolution=(48, 32),
            evaluations=(EvaluationProfile(evaluator="albedo", layer_name="a"),),
        )
        img = render(prepared, prof)["a"]
        left = img[:, :24]
        right = img[:, 24:]
        assert (left[..., 0] > 0.5).any()  # red on the left
        assert (right[..., 1] > 0.5).any()  # green override on the right
        assert not (right[..., 0] > 0.5).any()

    def test_scene_instancing_forbidden(self):
        with pytest.raises(ValueError):
            PackInstance(Scene())

    def test_emissive_instances_register_lights(self):
        pack = EntityPack()
        pack.add(SphereEntity(radius=0.2, material=Emissive(albedo=(5, 5, 5))))
        scene = Scene()
        scene.add(PackInstance(pack, position=(-2, 1, 0)))
        scene.add(PackInstance(pack, position=(2, 1, 0)))
        scene.add(PerspectiveCamera(position=(0, 0, -5)))
        prepared = prepare_scene(scene)
        assert int(prepared.lights.emissive_prim.shape[0]) == 2
