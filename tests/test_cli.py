"""CLI argument handling tests (reference Echo.Terminal switch parsing,
Program.cs:112-175)."""

import numpy as np
import pytest

from echorenderer_tpu.terminal import _parse_outputs, build_argparser, load_profile


class TestArgs:
    def test_defaults(self):
        args = build_argparser().parse_args([])
        assert args.profile is None and args.scene is None
        assert _parse_outputs(args.output) == [("main", "render.png")]

    def test_output_forms(self):
        assert _parse_outputs(["foo.png"]) == [("main", "foo.png")]
        assert _parse_outputs(["albedo=a.exr", "main=m.png"]) == [
            ("albedo", "a.exr"),
            ("main", "m.png"),
        ]

    def test_builtin_scene_profile(self):
        args = build_argparser().parse_args(
            ["--scene", "cornell_box", "-q", "0.5", "-r", "320x180", "--seed", "7"]
        )
        prof = load_profile(args)
        assert prof.scene is not None
        assert prof.resolution == (320, 180)
        assert prof.seed == 7
        names = [e.layer_name for e in prof.evaluations]
        assert names == ["albedo", "main", "normal_depth"]

    def test_unknown_scene_exits(self):
        args = build_argparser().parse_args(["--scene", "not_a_scene"])
        with pytest.raises(SystemExit):
            load_profile(args)

    def test_echo_profile_loading(self, tmp_path):
        doc = """
        :scene = new Scene
        {
            .Add(new SphereEntity { .Material = new Diffuse })
            .Add(new PerspectiveCamera { .Position = "0 0 -4" })
        }
        :prof = new RenderProfile
        {
            .Scene = link scene
            .Resolution = "64 48"
            .EvaluationProfiles = [ new EvaluationProfile { .Evaluator = new AlbedoEvaluator .LayerName = "a" } ]
        }
        """
        p = tmp_path / "t.echo"
        p.write_text(doc)
        args = build_argparser().parse_args(["-p", str(p), "--no-compose"])
        prof = load_profile(args)
        assert prof.resolution == (64, 48)
        assert prof.scene is not None
        assert prof.composition == ()

    def test_resolution_and_camera_override(self, tmp_path):
        args = build_argparser().parse_args(
            ["--scene", "material_ball", "-r", "100x50", "--camera", "main"]
        )
        prof = load_profile(args)
        assert prof.resolution == (100, 50)
        assert prof.camera_name == "main"
