"""Feature-parity tests: OneSided materials, depth-of-field cameras,
traversal-cost AOV, normal mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.models import scenes as builtin
from echorenderer_tpu.processes.render import (
    EvaluationProfile,
    RenderProfile,
    render,
    _sample_frame_jit,
)
from echorenderer_tpu.scene import (
    AmbientLight,
    Diffuse,
    Emissive,
    PerspectiveCamera,
    PlaneEntity,
    Scene,
    SphereEntity,
)
from echorenderer_tpu.scene.materials import OneSided
from echorenderer_tpu.scene.prepare import prepare_scene


def _albedo_frame(scene, res=(24, 18)):
    prepared = prepare_scene(scene)
    prof = RenderProfile(
        resolution=res,
        evaluations=(EvaluationProfile(evaluator="albedo", layer_name="a"),),
    )
    return render(prepared, prof)["a"]


class TestOneSided:
    def _scene(self, wrap):
        s = Scene()
        mat = Diffuse(albedo=(0.8, 0.1, 0.1))
        # plane facing +y; camera below it looks at the BACK face
        s.add(PlaneEntity(size=(6, 6), material=OneSided(mat) if wrap else mat))
        s.add(AmbientLight(intensity=(0.2, 0.4, 0.9)))
        cam = PerspectiveCamera(field_of_view=60, position=(0, -3, 0))
        cam.look_at((0, 0, 0))
        s.add(cam)
        return s

    def test_backface_passes_through(self):
        """A OneSided plane seen from behind is invisible: paths continue
        to the sky (reference OneSided.cs semantics)."""
        prepared = prepare_scene(self._scene(wrap=True))
        s_sum, _ = _sample_frame_jit(
            prepared, "path", (16, 12), 0, jnp.asarray(0, jnp.uint32), 8, 4, 2.5
        )
        img = np.asarray(s_sum) / 8
        # sky blue dominates: blue channel >> red everywhere
        assert img[..., 2].mean() > 3 * img[..., 0].mean()

    def test_twosided_blocks(self):
        prepared = prepare_scene(self._scene(wrap=False))
        s_sum, _ = _sample_frame_jit(
            prepared, "path", (16, 12), 0, jnp.asarray(0, jnp.uint32), 8, 4, 2.5
        )
        img = np.asarray(s_sum) / 8
        # the regular diffuse plane shades (dark backface but red-tinted
        # bounced light), nothing like open sky
        assert img[..., 2].mean() < 0.15


class TestDepthOfField:
    def test_lens_blurs_out_of_focus(self):
        """Thin-lens DoF (PerspectiveCamera.cs:32-63): an out-of-focus
        emissive sphere spreads energy over more pixels with a wide lens."""

        def make(lens):
            s = Scene()
            s.add(SphereEntity(radius=0.25, material=Emissive(albedo=(40, 40, 40)),
                               position=(0, 0, 2)))  # near, out of focus
            cam = PerspectiveCamera(
                field_of_view=40, position=(0, 0, -6),
                lens_radius=lens, focal_distance=14.0,  # focus far behind
            )
            cam.look_at((0, 0, 0))
            s.add(cam)
            s.add(AmbientLight(intensity=(0.01, 0.01, 0.01)))
            return prepare_scene(s)

        def coverage(lens):
            s_sum, _ = _sample_frame_jit(
                make(lens), "path", (48, 36), 0, jnp.asarray(0, jnp.uint32), 16, 2, 2.5
            )
            img = np.asarray(s_sum) / 16
            return (img.mean(-1) > 0.05).mean()

        sharp = coverage(0.0)
        blurred = coverage(0.6)
        assert blurred > sharp * 1.5  # the disk grew

    def test_focused_plane_stays_sharp(self):
        """Objects at the focal distance don't blur."""

        def edge_sharpness(lens):
            s = Scene()
            s.add(SphereEntity(radius=1.0, material=Emissive(albedo=(10, 10, 10)),
                               position=(0, 0, 0)))
            cam = PerspectiveCamera(field_of_view=40, position=(0, 0, -6),
                                    lens_radius=lens, focal_distance=6.0)
            cam.look_at((0, 0, 0))
            s.add(cam)
            prepared = prepare_scene(s)
            s_sum, _ = _sample_frame_jit(
                prepared, "path", (48, 36), 0, jnp.asarray(0, jnp.uint32), 32, 2, 2.5
            )
            img = np.asarray(s_sum).reshape(36, 48, 3) / 32
            return (img.mean(-1) > 0.5).mean()

        np.testing.assert_allclose(
            edge_sharpness(0.0), edge_sharpness(0.5), atol=0.02
        )


class TestAggregatorQuality:
    def test_cost_aov_renders_and_varies(self):
        prepared = prepare_scene(builtin.sphere_field(80))
        prof = RenderProfile(
            resolution=(32, 24),
            evaluations=(
                EvaluationProfile(evaluator="aggregator_quality", layer_name="q"),
            ),
        )
        img = render(prepared, prof)["q"]
        assert np.isfinite(img).all()
        assert img.std() > 0.01  # actual cost variation across the frame
        assert img.min() >= 0.0 and img.max() <= 1.0


def test_subdivide_oversized_triangles():
    """prepare_scene(subdivide=area) 4-way splits big triangles (reference
    TriangleEntity.GetSubdivided); image is unchanged geometry-wise."""
    import numpy as np

    from echorenderer_tpu.models import scenes
    from echorenderer_tpu.processes.render import (
        EvaluationProfile, RenderProfile, render,
    )
    from echorenderer_tpu.scene.prepare import prepare_scene

    base = prepare_scene(scenes.cornell_box())
    sub = prepare_scene(scenes.cornell_box(), subdivide=10.0)
    assert sub.geometry.num_triangles > base.geometry.num_triangles
    # areas conserved
    a = lambda g: float(
        0.5 * np.linalg.norm(
            np.cross(np.asarray(g.tri_e1), np.asarray(g.tri_e2)), axis=-1
        ).sum()
    )
    np.testing.assert_allclose(a(sub.geometry), a(base.geometry), rtol=1e-5)
    # and no triangle is bigger than the threshold any more (max_iteration
    # permitting: cornell's largest faces are 50 area -> 2 levels suffice)
    areas = 0.5 * np.linalg.norm(
        np.cross(np.asarray(sub.geometry.tri_e1), np.asarray(sub.geometry.tri_e2)),
        axis=-1,
    )
    assert areas.max() <= 10.0 + 1e-4

    prof = RenderProfile(
        resolution=(32, 24),
        evaluations=(EvaluationProfile(evaluator="albedo", layer_name="a"),),
    )
    img_a = render(base, prof)["a"]
    img_b = render(sub, prof)["a"]
    np.testing.assert_allclose(img_b, img_a, atol=2e-3)
