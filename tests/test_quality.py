"""Reference-anchored quality harness (VERDICT.md round-1 item #8).

The C# reference renders cannot run here, so physics itself is the oracle:
  - furnace tests: an object in a uniform environment must reflect exactly
    the environment radiance for energy-preserving materials, and never
    MORE than it for any material (energy conservation) — the renderer
    analogue of the reference's BxDF energy tests
    (Echo.UnitTests/Evaluation/BxDFTests.cs:49-80);
  - analytic glass-sphere transmission: a ray through the center of a
    smooth dielectric sphere refracts at BOTH interfaces (entry + exit),
    so the transmitted radiance is E*(1-F)/(1+F) — this catches the
    "continuation rays blanket-ignore the previous primitive" bug class
    (reference findFar, Scenic/Geometries/SphereEntity.cs:88);
  - trace-level findFar semantics on every accelerator path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.models import scenes
from echorenderer_tpu.processes.render import _sample_frame_jit
from echorenderer_tpu.scene import (
    AmbientLight,
    CoatedDiffuse,
    Conductor,
    Dielectric,
    Diffuse,
    Emissive,
    Invisible,
    PerspectiveCamera,
    PlaneEntity,
    Scene,
    SphereEntity,
)
from echorenderer_tpu.scene.prepare import prepare_scene

ENV = 1.0  # furnace environment radiance


def _furnace_scene(material):
    """A unit sphere of `material` filling the frame in a uniform
    environment of radiance ENV."""
    scene = Scene()
    scene.add(SphereEntity(radius=1.0, material=material, position=(0, 0, 0)))
    scene.add(AmbientLight(intensity=(ENV, ENV, ENV)))
    # fov chosen so the whole frame (diagonal included) stays inside the
    # sphere silhouette, clear of grazing-incidence TIR chains at the rim
    cam = PerspectiveCamera(field_of_view=20.0, position=(0, 0, -3.0))
    cam.look_at((0, 0, 0))
    scene.add(cam)
    return scene


def _render_mean(scene, res=(6, 6), spp=512, bounce=16):
    prepared = prepare_scene(scene)
    s_sum, _ = _sample_frame_jit(
        prepared, "path", res, 0, jnp.asarray(0, jnp.uint32), spp, bounce, 2.5
    )
    return np.asarray(s_sum) / spp


# materials whose single-scattering models are exactly energy-preserving at
# unit albedo: the furnace must be FLAT at the environment radiance
_PRESERVING = [
    ("invisible", Invisible()),
    ("diffuse_lambert", Diffuse(albedo=(1.0, 1.0, 1.0), roughness=0.0)),
    ("dielectric_smooth", Dielectric(albedo=(1.0, 1.0, 1.0), roughness=0.0)),
]

# every other material must never AMPLIFY the environment (conservation);
# single-scattering GGX/Oren-Nayar lose some energy, conductors absorb
_CONSERVING = [
    ("diffuse_oren_nayar", Diffuse(albedo=(1.0, 1.0, 1.0), roughness=0.5)),
    ("dielectric_rough", Dielectric(albedo=(1.0, 1.0, 1.0), roughness=0.3)),
    ("conductor", Conductor(albedo=(1.0, 1.0, 1.0), roughness=0.2)),
    ("conductor_smooth", Conductor(albedo=(1.0, 1.0, 1.0), roughness=0.0)),
    ("coated_diffuse", CoatedDiffuse(albedo=(1.0, 1.0, 1.0))),
    ("diffuse_transmissive", Diffuse(albedo=(1.0, 1.0, 1.0), transmissive=True)),
]


class TestFurnace:
    @pytest.mark.parametrize("name,mat", _PRESERVING, ids=[n for n, _ in _PRESERVING])
    def test_white_furnace_flat(self, name, mat):
        img = _render_mean(_furnace_scene(mat))
        # mean within MC noise of the environment; bounce-limit truncation
        # of TIR chains costs the smooth dielectric a small bias, hence 2%
        assert abs(img.mean() - ENV) < 0.02, f"{name}: furnace mean {img.mean():.4f}"
        assert np.all(np.abs(img - ENV) < 0.08), f"{name}: max dev {np.abs(img-ENV).max():.4f}"

    @pytest.mark.parametrize("name,mat", _CONSERVING, ids=[n for n, _ in _CONSERVING])
    def test_energy_conservation(self, name, mat):
        img = _render_mean(_furnace_scene(mat), spp=256)
        assert img.mean() <= ENV * 1.02, f"{name}: furnace mean {img.mean():.4f} amplifies"
        # and the material interacts sensibly (not black)
        assert img.mean() > 0.05, f"{name}: furnace mean {img.mean():.4f} suspiciously dark"


class TestGlassSphere:
    def test_center_ray_double_refraction(self):
        """A camera ray through a smooth glass sphere's center crosses two
        normal-incidence interfaces: transmitted radiance = E*(1-F)/(1+F)
        with F = ((n-1)/(n+1))^2. Missing the exit interface (the round-1
        findFar bug) yields E*(1-F) instead — 4% high — so this test pins
        the physics to better than 1.5%."""
        E = 5.0
        scene = Scene()
        scene.add(
            SphereEntity(
                radius=1.0,
                material=Dielectric(albedo=(1, 1, 1), roughness=0.0, refractive_index=1.5),
                position=(0, 0, 0),
            )
        )
        # big emissive wall behind the sphere (facing -z, toward the camera)
        scene.add(
            PlaneEntity(
                size=(200.0, 200.0),
                material=Emissive(albedo=(E, E, E)),
                position=(0, 0, 8.0),
                rotation=(-90, 0, 0),
            )
        )
        cam = PerspectiveCamera(field_of_view=1.0, position=(0, 0, -5.0))
        cam.look_at((0, 0, 0))
        scene.add(cam)

        img = _render_mean(scene, res=(2, 2), spp=4096, bounce=16)
        n = 1.5
        F = ((n - 1.0) / (n + 1.0)) ** 2
        expected = E * (1.0 - F) / (1.0 + F)  # geometric series over internal bounces
        got = img.mean()
        assert abs(got - expected) / expected < 0.015, (
            f"transmission {got:.4f} vs analytic {expected:.4f} "
            f"(one-interface bug would give {E * (1 - F):.4f})"
        )

    def test_naive_path_consistency_glass_cornell(self):
        """Cornell box with a glass sphere: NEE+MIS path tracing and the
        brute-force naive integrator agree — double refraction + TIR paths
        included (VERDICT round-1 next-step #2 validation)."""
        scene = scenes.cornell_box()
        scene.add(
            SphereEntity(
                radius=2.0,
                material=Dielectric(albedo=(1, 1, 1), roughness=0.0, refractive_index=1.5),
                position=(0.0, 4.0, -2.0),
            )
        )
        prepared = prepare_scene(scene)
        res = (16, 12)
        a, _ = _sample_frame_jit(
            prepared, "path", res, 0, jnp.asarray(0, jnp.uint32), 192, 8, 2.5
        )
        b, _ = _sample_frame_jit(
            prepared, "naive", res, 0, jnp.asarray(0, jnp.uint32), 768, 8, 2.5
        )
        a = np.asarray(a) / 192
        b = np.asarray(b) / 768
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.05)


class TestFindFarSemantics:
    """Trace-level findFar checks on all three accelerator paths: a ray
    whose origin is inside its `ignore` sphere must hit that sphere's far
    side (exit interface), and a triangle ignore must still be absolute."""

    def _geom(self, n_extra_tris):
        from echorenderer_tpu.ops.intersect import FlatGeometry

        rs = np.random.RandomState(11)
        # far-away triangle cloud so the sphere is never occluded
        v0 = rs.uniform(50, 60, (n_extra_tris, 3)).astype(np.float32)
        e1 = rs.uniform(-1, 1, (n_extra_tris, 3)).astype(np.float32)
        e2 = rs.uniform(-1, 1, (n_extra_tris, 3)).astype(np.float32)
        z3 = np.zeros((n_extra_tris, 3), np.float32)
        z2 = np.zeros((n_extra_tris, 2), np.float32)
        return FlatGeometry(
            tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
            tri_n0=jnp.asarray(z3), tri_n1=jnp.asarray(z3), tri_n2=jnp.asarray(z3),
            tri_uv0=jnp.asarray(z2), tri_uv1=jnp.asarray(z2), tri_uv2=jnp.asarray(z2),
            tri_mat=jnp.zeros(n_extra_tris, jnp.int32),
            sph_center=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
            sph_radius=jnp.asarray([1.0], jnp.float32),
            sph_mat=jnp.zeros(1, jnp.int32),
        )

    def _check(self, trace_fn, geom, sphere_pid):
        # origin just inside the -z surface, direction +z: far root at ~2
        o = jnp.asarray([[0.0, 0.0, -0.999]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        ig = jnp.asarray([sphere_pid], jnp.int32)
        hit = trace_fn(o, d, jnp.asarray([3.4e38], jnp.float32), ig)
        assert int(hit.prim[0]) == sphere_pid, "exit interface missed (findFar)"
        np.testing.assert_allclose(float(hit.t[0]), 1.999, rtol=1e-4)
        # exterior ray bouncing off the ignored sphere must NOT re-hit it
        o2 = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        d2 = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit2 = trace_fn(o2, d2, jnp.asarray([3.4e38], jnp.float32), ig)
        assert int(hit2.prim[0]) != sphere_pid

    def test_linear(self):
        from echorenderer_tpu.ops.intersect import intersect_linear

        geom = self._geom(4)
        self._check(lambda o, d, t, ig: intersect_linear(geom, o, d, t, ig), geom, 4)

    def test_bvh(self):
        from echorenderer_tpu.aggregation.bvh import build_bvh, geometry_bounds, intersect_bvh

        geom = self._geom(40)
        gnp = {k: np.asarray(v) for k, v in geom._asdict().items()}
        bvh = build_bvh(*geometry_bounds(gnp))
        self._check(lambda o, d, t, ig: intersect_bvh(geom, bvh, o, d, t, ig), geom, 40)

    def test_pallas(self):
        from echorenderer_tpu.ops.pallas_intersect import build_prim_soa, intersect_pallas

        geom = self._geom(40)
        soa = build_prim_soa(geom)
        self._check(
            lambda o, d, t, ig: intersect_pallas(geom, soa, o, d, t, ig), geom, 40
        )

    def test_occlude_far_root_blocks(self):
        """A shadow ray from inside the ignored sphere is blocked by its
        own far interface (self-shadowing through findFar)."""
        from echorenderer_tpu.ops.intersect import occlude_linear

        geom = self._geom(4)
        o = jnp.asarray([[0.0, 0.0, -0.999]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        ig = jnp.asarray([4], jnp.int32)
        blocked = occlude_linear(geom, o, d, jnp.asarray([10.0], jnp.float32), ig)
        assert bool(blocked[0])
