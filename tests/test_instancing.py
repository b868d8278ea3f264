"""Pack instancing tests (reference Scenic/Hierarchies/PackInstance.cs,
PreparedInstance.cs, EntityPackTests.cs). Packs placed by multiple
PackInstances share ONE copy of their geometry (pack-local space) and are
traced through per-instance transforms by the TLAS kernel;
`prepare_scene(..., instancing="bake")` flattens everything and is the
correctness oracle."""

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
    def test_instances_share_geometry(self):
        """TLAS instancing stores ONE copy of the pack (O(pack) memory,
        reference PreparedInstance.cs) — round 1 baked 2 copies."""
        scene = Scene()
        pack = _pack()
        scene.add(PackInstance(pack, position=(-1.5, 0, 0)))
        scene.add(PackInstance(pack, position=(1.5, 0, 0), scale=0.5))
        scene.add(PerspectiveCamera(position=(0, 0, -5)))
        prepared = prepare_scene(scene, instancing="tlas")
        assert prepared.instances is not None
        assert prepared.instances.num_instances == 3  # root + 2 placements
        assert prepared.geometry.num_spheres == 2  # 2 spheres, ONE copy
        # bake mode still duplicates (the correctness oracle)
        baked = prepare_scene(scene, instancing="bake")
        assert baked.instances is None
        assert baked.geometry.num_spheres == 4

    def test_tlas_matches_bake_image(self):
        """The TLAS path and the transform-baking path draw the same image
        (path evaluator exercises trace/occlude/interact/NEE end to end)."""
        scene = Scene()
        pack = _pack()
        scene.add(PackInstance(pack, position=(-1.5, 0, 0)))
        scene.add(
            PackInstance(pack, position=(1.5, 0.2, 0), scale=0.7,
                         rotation=(0, 40, 10))
        )
        scene.add(PackInstance(pack, position=(0, -1.2, 1.0), scale=1.3))
        scene.add(AmbientLight(intensity=(0.8, 0.9, 1.0)))
        cam = PerspectiveCamera(field_of_view=70, position=(0, 0.4, -4))
        cam.look_at((0, 0, 0))
        scene.add(cam)
        prof = RenderProfile(
            resolution=(48, 32),
            evaluations=(
                EvaluationProfile(
                    evaluator="path", samples_per_epoch=4, max_epoch=1,
                    bounce_limit=3, adaptive=False,
                ),
            ),
        )
        img_tlas = render(prepare_scene(scene, instancing="tlas"), prof)["main"]
        img_bake = render(prepare_scene(scene, instancing="bake"), prof)["main"]
        # same estimator, same draws; only the accelerator differs — images
        # agree to float tolerance (intersection orders differ slightly)
        scale = max(float(np.mean(img_bake)), 1e-6)
        assert float(np.mean(np.abs(img_tlas - img_bake))) / scale < 0.02

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
        prepared = prepare_scene(scene, instancing="tlas")
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
        prepared = prepare_scene(scene, instancing="tlas")
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
        prepared = prepare_scene(scene, instancing="tlas")
        assert int(prepared.lights.emissive_prim.shape[0]) == 2

    def test_thousand_instances_o_pack_memory(self):
        """1,000 placements of one pack prepare in O(pack) memory
        (VERDICT #4 gate; reference PreparedInstance.cs:47-61)."""
        pack = _pack()
        scene = Scene()
        rs = np.random.RandomState(7)
        for i in range(1000):
            scene.add(
                PackInstance(
                    pack,
                    position=tuple(rs.uniform(-50, 50, 3)),
                    scale=float(rs.uniform(0.5, 1.5)),
                )
            )
        scene.add(AmbientLight(intensity=(1, 1, 1)))
        scene.add(PerspectiveCamera(position=(0, 0, -120)))
        prepared = prepare_scene(scene, instancing="tlas")
        # geometry stays pack-sized (plus the degenerate root triangle)
        assert prepared.geometry.num_spheres == 2
        assert prepared.geometry.num_triangles == 1
        assert prepared.instances.num_instances == 1001
        # per-instance cost: one 16-float row + one remap row
        assert prepared.instances.rows.shape == (1001, 16)

    def test_nested_instances_expand(self):
        """A shared pack containing an instance of another shared pack:
        every outer placement spawns the inner one too."""
        inner = _pack()
        outer = EntityPack()
        outer.add(SphereEntity(radius=0.3, material=Diffuse(albedo=(0.9, 0.9, 0.2))))
        outer.add(PackInstance(inner, position=(0, 1.2, 0), scale=0.5))
        scene = Scene()
        # inner is ALSO instanced directly, so both packs are shared
        scene.add(PackInstance(inner, position=(-3, 0, 0)))
        scene.add(PackInstance(outer, position=(0, 0, 0)))
        scene.add(PackInstance(outer, position=(3, 0, 0), scale=0.8))
        scene.add(AmbientLight(intensity=(1, 1, 1)))
        scene.add(PerspectiveCamera(position=(0, 0, -8)))
        prepared = prepare_scene(scene, instancing="tlas")
        # instances: root + inner(direct) + outer x2 + inner(nested) x2
        assert prepared.instances.num_instances == 6
        # storage: inner pack (2 spheres) + outer shell (1 sphere), 1 copy
        assert prepared.geometry.num_spheres == 3
        prof = RenderProfile(
            resolution=(48, 24),
            evaluations=(EvaluationProfile(evaluator="albedo", layer_name="a"),),
        )
        img = render(prepared, prof)["a"]
        baked = render(prepare_scene(scene, instancing="bake"), prof)["a"]
        assert float(np.mean(np.abs(img - baked))) < 0.02


class TestAutoBake:
    def test_small_auto_scene_bakes_for_megakernel(self):
        """auto mode bakes a small TLAS scene (unrolled prims fit the
        fused megakernel's limit) so it rides the 14x fused path; tlas
        mode still shares (VERDICT r4 item #5)."""
        scene = Scene()
        pack = _pack()
        scene.add(PackInstance(pack, position=(-1.5, 0, 0)))
        scene.add(PackInstance(pack, position=(1.5, 0, 0), scale=0.5))
        scene.add(PerspectiveCamera(position=(0, 0, -5)))
        auto = prepare_scene(scene)
        assert auto.instances is None  # baked
        assert auto.geometry.num_spheres == 4  # duplicated copies
        forced = prepare_scene(scene, instancing="tlas")
        assert forced.instances is not None

    def test_large_auto_scene_stays_tlas(self):
        """auto keeps the O(pack) TLAS once the unrolled count exceeds the
        megakernel limit (the thousand-instance test's regime)."""
        pack = EntityPack()
        for i in range(40):
            pack.add(SphereEntity(radius=0.1, position=(i * 0.3, 0, 0)))
        scene = Scene()
        for i in range(60):  # 2400 unrolled prims > 2048
            scene.add(PackInstance(pack, position=(0, 0, i * 0.5)))
        scene.add(PerspectiveCamera(position=(0, 0, -5)))
        prepared = prepare_scene(scene)
        assert prepared.instances is not None
        assert prepared.geometry.num_spheres == 40
