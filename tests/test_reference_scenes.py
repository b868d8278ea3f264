"""The reference's OWN .echo scene files must parse, construct, and render
(VERDICT.md round-1 item #6: BOM tolerance, 0x-hex colors, profile
properties on StandardPathTracedProfile, texture-valued .Roughness,
ImportPath-relative assets).

Fixtures are verbatim copies of /root/reference/ext/Scenes/Simple/ (scene
DATA, not code); the environment texture the bunny scene imports is
synthesized small since the original photo is not shipped here."""

import shutil
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures" / "reference_scenes"


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_scenes")
    for f in FIXTURES.iterdir():
        shutil.copy(f, d / f.name)
    # small stand-in for the UlmerMuenster.jpg environment photo
    from echorenderer_tpu.io.images import save

    h, w = 32, 64
    v = (np.arange(h, dtype=np.float32) + 0.5) / h
    sky = np.stack(
        [np.tile(0.2 + 0.5 * v[:, None], (1, w)),
         np.tile(0.3 + 0.4 * v[:, None], (1, w)),
         np.tile(0.5 + 0.5 * v[:, None], (1, w))], -1)
    save(d / "UlmerMuenster.jpg", sky)
    return d


class TestCornellEcho:
    def test_constructs(self, scene_dir):
        from echorenderer_tpu.io.echo_dsl import EchoSource

        src = EchoSource(scene_dir / "cornell.echo")
        assert set(src.names()) == {"scene", "raw", "standard", "final"}
        scene = src.construct("scene")
        assert len(scene.children) == 10  # 7 planes + 2 boxes + camera
        std = src.construct("standard")
        assert std.resolution == (512, 512)
        final = src.construct("final")
        assert final.resolution == (1024, 1024)

    def test_renders(self, scene_dir):
        from echorenderer_tpu.io.echo_dsl import EchoSource
        from echorenderer_tpu.processes.render import _sample_frame_jit
        from echorenderer_tpu.scene.prepare import prepare_scene

        src = EchoSource(scene_dir / "cornell.echo")
        prepared = prepare_scene(src.construct("scene"))
        s_sum, _ = _sample_frame_jit(
            prepared, "path", (24, 24), 0, jnp.asarray(0, jnp.uint32), 8, 6, 2.5
        )
        img = np.asarray(s_sum).reshape(24, 24, 3) / 8
        assert np.isfinite(img).all()
        assert img.mean() > 0.02  # lit
        # the left wall is red, the right is green in Echo's cornell.echo
        left = img[8:16, :6].mean(axis=(0, 1))
        right = img[8:16, -6:].mean(axis=(0, 1))
        assert left[0] > left[1], f"left wall not reddish: {left}"
        assert right[1] > right[0], f"right wall not greenish: {right}"

    def test_hex_color_forms(self):
        from echorenderer_tpu.utils.colors import parse_color

        c = parse_color("0x00CB21")
        assert c[1] > c[0] and c[1] > c[2]  # green
        gray = parse_color("0xF")  # single nibble = gray
        np.testing.assert_allclose(gray[:3], 1.0, atol=1e-5)
        np.testing.assert_allclose(parse_color("0xEEEEF2"), parse_color("#EEEEF2"))


class TestBunnyEcho:
    def test_constructs_all_profiles(self, scene_dir):
        from echorenderer_tpu.io.echo_dsl import EchoSource

        src = EchoSource(scene_dir / "bunny.echo")
        scene = src.construct("scene")
        assert len(scene.children) == 11
        explore = src.construct("explore")
        assert explore.resolution == (2048, 1024)
        assert explore.camera_name == "cylindrical"
        assert len(explore.evaluations) == 3
        std = src.construct("standard")
        assert len(std.composition) == 1  # OnlyDenoise = True

    def test_renders(self, scene_dir):
        from echorenderer_tpu.io.echo_dsl import EchoSource
        from echorenderer_tpu.processes.render import _sample_frame_jit
        from echorenderer_tpu.scene.prepare import prepare_scene

        src = EchoSource(scene_dir / "bunny.echo")
        prepared = prepare_scene(src.construct("scene"))
        assert prepared.geometry.num_triangles > 100  # bunny.obj loaded
        s_sum, _ = _sample_frame_jit(
            prepared, "path", (20, 12), 0, jnp.asarray(0, jnp.uint32), 4, 5, 2.5
        )
        img = np.asarray(s_sum) / 4
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
