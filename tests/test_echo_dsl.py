"""Echo description language tests (reference InOut/EchoDescription:
grammar, lexical scoping, links, literal coercion, profile construction)."""

import numpy as np
import pytest

from echorenderer_tpu.io.echo_dsl import EchoSource, coerce_literal, tokenize

DOC = """
# a small but representative scene
:scene = new Scene
{
    :gray = new Pure("hdr(0.75 0.75 0.75)")
    :matte = new Diffuse { .Albedo = link gray .Roughness = "0.3" }

    .Add(new PlaneEntity { .Material = link matte .Size = "32 24" })
    .Add(new SphereEntity
    {
        .Material = new Dielectric { .Albedo = link gray .RefractiveIndex = "1.5" }
        .Radius = "1" .Position = "-3 1 -2"
    })
    .Add(new PointLight { .Intensity = "hdr(10 10 10)" .Position = "0 6 -7" })
    .Add(new AmbientLight { .Intensity = "hdr(0.1 0.1 0.12)" })
    .Add(new PerspectiveCamera { .Name = "main" .FieldOfView = "110" .Position = "0 3 -6" .Rotation = "30 0 0" })
}

:raw = new RenderProfile
{
    .Scene = link scene
    .Resolution = "64 48"
    .EvaluationProfiles =
    [
        new EvaluationProfile { .Evaluator = new PathTracedEvaluator .LayerName = "main" .NoiseThreshold = "0.02" }
        new EvaluationProfile { .Evaluator = new AlbedoEvaluator .LayerName = "albedo" }
    ]
    .CompositionLayers = [ new ToneMapper { .Curve = "aces" } ]
}
"""


class TestTokenizer:
    def test_comments_stripped(self):
        toks = tokenize("# hello\n:a = new Scene # trailing\n")
        kinds = [k for k, _, _ in toks]
        assert kinds == ["decl", "punct", "word", "word"]

    def test_strings_and_members(self):
        toks = tokenize('.Albedo = "hdr(1 2 3)"')
        assert toks[0] == ("member", ".Albedo", 1)
        assert toks[2][0] == "string"


class TestLiterals:
    def test_bool_number_vector(self):
        assert coerce_literal("True") is True
        assert coerce_literal("1.5") == 1.5
        np.testing.assert_allclose(coerce_literal("0 6 -7"), [0, 6, -7])

    def test_colors(self):
        c = coerce_literal("hdr(1 2 3)")
        np.testing.assert_allclose(c[:3], [1, 2, 3])
        c2 = coerce_literal("rgb(255 0 0)")
        np.testing.assert_allclose(c2[:3], [1, 0, 0], atol=1e-5)

    def test_path_passthrough(self):
        assert coerce_literal("bunny.obj") == "bunny.obj"


class TestConstruction:
    def test_scene_graph(self):
        from echorenderer_tpu.scene import PointLight, Scene, SphereEntity
        from echorenderer_tpu.scene.materials import Dielectric, Diffuse

        src = EchoSource(DOC)
        scene = src.construct("scene")
        assert isinstance(scene, Scene)
        kinds = [type(c).__name__ for c in scene.children]
        assert kinds == [
            "PlaneEntity", "SphereEntity", "PointLight", "AmbientLight", "PerspectiveCamera",
        ]
        sphere = scene.children[1]
        assert isinstance(sphere.material, Dielectric)
        assert sphere.material.refractive_index == 1.5
        np.testing.assert_allclose(sphere.position, [-3, 1, -2])
        plane = scene.children[0]
        assert isinstance(plane.material, Diffuse)
        assert plane.material.roughness == pytest.approx(0.3)
        np.testing.assert_allclose(plane.material.constant_albedo(), [0.75] * 3)

    def test_links_alias_same_object(self):
        src = EchoSource(DOC)
        scene = src.construct("scene")
        prof = src.construct("raw")
        assert prof.scene is scene  # same constructed instance

    def test_render_profile(self):
        from echorenderer_tpu.processes.composition import ToneMapper

        src = EchoSource(DOC)
        prof = src.construct("raw")
        assert prof.resolution == (64, 48)
        assert len(prof.evaluations) == 2
        assert prof.evaluations[0].evaluator == "path"
        assert prof.evaluations[0].noise_threshold == pytest.approx(0.02)
        assert prof.evaluations[1].evaluator == "albedo"
        assert isinstance(prof.composition[0], ToneMapper)

    def test_construct_first_by_type(self):
        from echorenderer_tpu.processes.render import RenderProfile

        src = EchoSource(DOC)
        prof = src.construct_first(RenderProfile)
        assert isinstance(prof, RenderProfile)

    def test_lexical_scope_inner_overrides(self):
        doc = """
        :c = new Pure("hdr(1 0 0)")
        :outer = new Scene
        {
            :c = new Pure("hdr(0 1 0)")
            .Add(new PlaneEntity { .Material = new Diffuse { .Albedo = link c } })
        }
        """
        src = EchoSource(doc)
        scene = src.construct("outer")
        np.testing.assert_allclose(
            scene.children[0].material.constant_albedo(), [0, 1, 0]
        )

    def test_unknown_type_raises(self):
        with pytest.raises(KeyError):
            EchoSource(":x = new NotAThing").construct("x")

    def test_syntax_error_reports_line(self):
        with pytest.raises(SyntaxError):
            EchoSource(":x = = new Scene")


class TestEndToEnd:
    def test_parse_prepare_render_tiny(self):
        """Full path: .echo text -> scene -> prepared -> 1 albedo frame."""
        from echorenderer_tpu.processes.render import render
        from echorenderer_tpu.scene.prepare import prepare_scene

        src = EchoSource(DOC)
        prof = src.construct("raw")
        prof.resolution = (16, 12)
        prof.evaluations = (prof.evaluations[1],)  # albedo only: cheap
        prepared = prepare_scene(prof.scene, prof.camera_name)
        out = render(prepared, prof)
        assert out["albedo"].shape == (12, 16, 3)
        assert np.isfinite(out["albedo"]).all()


class TestRepoScenes:
    """The .echo files shipped in scenes/ must parse and construct."""

    @pytest.mark.parametrize("name", ["cornell.echo", "showcase.echo"])
    def test_scene_files_construct(self, name):
        from pathlib import Path

        from echorenderer_tpu.processes.render import RenderProfile
        from echorenderer_tpu.scene.entities import Scene

        path = Path(__file__).parent.parent / "scenes" / name
        src = EchoSource(path)
        scene = src.construct_first(Scene)
        assert len(scene.children) > 2
        prof = src.construct_first(RenderProfile)
        assert prof.scene is scene or prof.scene is None or isinstance(prof.scene, Scene)

    def test_showcase_renders(self):
        from pathlib import Path

        from echorenderer_tpu.processes.render import render
        from echorenderer_tpu.scene.prepare import prepare_scene

        path = Path(__file__).parent.parent / "scenes" / "showcase.echo"
        src = EchoSource(path)
        prof = src.construct("fast")
        prof.resolution = (24, 16)
        prof.evaluations[0].samples_per_epoch = 2
        prof.evaluations[0].max_epoch = 1
        prof.evaluations[0].bounce_limit = 3
        prepared = prepare_scene(prof.scene)
        assert prepared.tex_atlas.shape[0] >= 2  # cloud + gradient textures
        out = render(prepared, prof)
        assert np.isfinite(out["main"]).all()


@pytest.mark.parametrize("method", ["Map", "Set"])
def test_pack_instance_swatch_syntax(tmp_path, method):
    """PackInstance + MaterialSwatch in .echo: two placements of one pack,
    the second overriding red -> green through the swatch (reference
    PackInstance.Swatch; .Set is the reference's EchoSourceUsable spelling,
    MaterialSwatch.cs:73-74; .Map is this dialect's alias)."""
    src_text = """
:red = new Diffuse { .Albedo = "0.9 0.1 0.1" }
:green = new Diffuse { .Albedo = "0.1 0.9 0.1" }
:pack = new EntityPack
{
    .Add(new SphereEntity { .Material = link red .Radius = "0.6" })
}
:sw = new MaterialSwatch { .Map(link red link green) }
:scene = new Scene
{
    .Add(new PackInstance { .Pack = link pack .Position = "-1.2 0 0" })
    .Add(new PackInstance { .Pack = link pack .Swatch = link sw .Position = "1.2 0 0" })
    .Add(new AmbientLight { .Intensity = "0.01 0.01 0.01" })
    .Add(new PerspectiveCamera { .Position = "0 0 -4" .FieldOfView = "70" })
}
"""
    f = tmp_path / "swatch.echo"
    f.write_text(src_text.replace(".Map(", f".{method}("))
    from echorenderer_tpu.io.echo_dsl import EchoSource
    from echorenderer_tpu.processes.render import (
        EvaluationProfile,
        RenderProfile,
        render,
    )
    from echorenderer_tpu.scene.entities import Scene
    from echorenderer_tpu.scene.prepare import prepare_scene

    scene = EchoSource(str(f)).construct_first(Scene)
    # force TLAS: auto now bakes scenes this small (megakernel fast path);
    # this test pins the DSL's shared-pack + swatch plumbing specifically
    prepared = prepare_scene(scene, instancing="tlas")
    # one shared sphere, three instances (root + 2 placements)
    assert prepared.instances is not None
    assert prepared.geometry.num_spheres == 1

    prof = RenderProfile(
        resolution=(48, 24),
        evaluations=(EvaluationProfile(evaluator="albedo", layer_name="a"),),
    )
    img = render(prepared, prof)["a"]
    left, right = img[:, :24], img[:, 24:]
    assert (left[..., 0] > 0.5).any() and not (left[..., 1] > 0.5).any()
    assert (right[..., 1] > 0.5).any() and not (right[..., 0] > 0.5).any()
