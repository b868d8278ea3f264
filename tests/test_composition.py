"""Compositing stack tests (reference Processes/Composition operators)."""

import jax.numpy as jnp
import numpy as np

from echorenderer_tpu.processes import composition as comp


def _img(h=24, w=32, value=0.5):
    return jnp.full((h, w, 3), value, jnp.float32)


class TestOperators:
    def test_gaussian_blur_preserves_mean_and_smooths(self):
        rs = np.random.RandomState(0)
        img = jnp.asarray(rs.uniform(0, 1, (16, 16, 3)).astype(np.float32))
        out = comp.gaussian_blur(img, 1.5)
        assert float(jnp.std(out)) < float(jnp.std(img))
        np.testing.assert_allclose(float(jnp.mean(out)), float(jnp.mean(img)), atol=0.02)

    def test_auto_exposure_hits_target(self):
        layers = {"main": _img(value=0.02)}
        out = comp.AutoExposure(average_luminance=0.18).apply(layers)
        lum = np.asarray(out["main"]).mean()
        np.testing.assert_allclose(lum, 0.18, rtol=0.05)

    def test_auto_exposure_clamps(self):
        layers = {"main": _img(value=1e-5)}
        out = comp.AutoExposure(average_luminance=0.18, clamp=(0.5, 4.0)).apply(layers)
        assert np.asarray(out["main"]).max() <= 1e-5 * 4.0 + 1e-9

    def test_bloom_only_brightens(self):
        img = np.zeros((16, 16, 3), np.float32)
        img[8, 8] = 40.0  # hot pixel
        layers = {"main": jnp.asarray(img)}
        out = comp.Bloom(threshold=1.0, intensity=1.0, sigma=0.1).apply(layers)
        res = np.asarray(out["main"])
        assert (res >= img - 1e-6).all()
        assert res[8, 4].sum() > 0.0  # energy spread to neighbors

    def test_tonemap_curves_bounded_and_monotone(self):
        l = jnp.linspace(0.0, 20.0, 256)
        for name, fn in comp.LUMINANCE_CURVES.items():
            y = np.asarray(fn(l))
            assert np.isfinite(y).all(), name
            assert (np.diff(y) >= -1e-4).all(), f"{name} not monotone"
            if name != "pass_through":
                assert y.max() <= 1.5, name

    def test_tonemapper_output_in_unit_range(self):
        layers = {"main": _img(value=7.0)}
        out = comp.ToneMapper(curve="aces").apply(layers)
        res = np.asarray(out["main"])
        assert res.min() >= 0.0 and res.max() <= 1.0

    def test_vignette_darkens_corners_not_center(self):
        layers = {"main": _img(32, 32, 0.8)}
        out = comp.Vignette(intensity=0.5, grain=0.0).apply(layers)
        res = np.asarray(out["main"])
        assert res[16, 16].mean() > res[0, 0].mean()

    def test_watermark_changes_corner_only(self):
        layers = {"main": _img(64, 128, 0.5)}
        out = comp.Watermark(text="echo", scale=1, margin=4).apply(layers)
        res = np.asarray(out["main"])
        # top-left corner untouched, bottom-right region modified
        np.testing.assert_allclose(res[-1, 0], 0.5, atol=1e-6)
        assert np.abs(res[:20, -40:] - 0.5).max() > 0.01

    def test_texture_manage_copy_clear(self):
        layers = {"a": _img(value=0.3), "b": _img(value=0.9)}
        out = comp.TextureManage(copy_from="a", copy_to="c").apply(dict(layers))
        np.testing.assert_array_equal(np.asarray(out["c"]), np.asarray(layers["a"]))
        out = comp.TextureManage(clear="b", clear_color=(0, 0, 0)).apply(out)
        assert np.asarray(out["b"]).max() == 0.0


class TestDenoise:
    def test_bilateral_reduces_noise_preserves_edge(self):
        rs = np.random.RandomState(1)
        h, w = 24, 24
        clean = np.zeros((h, w, 3), np.float32)
        clean[:, w // 2 :] = 1.0  # hard vertical edge
        albedo = clean.copy()
        normal = np.zeros((h, w, 4), np.float32)
        normal[..., 2] = 1.0
        noisy = clean + rs.normal(0, 0.1, clean.shape).astype(np.float32)
        layers = {
            "main": jnp.asarray(noisy),
            "albedo": jnp.asarray(albedo),
            "normal_depth": jnp.asarray(normal),
        }
        out = comp.BilateralDenoise(radius=3).apply(layers)
        res = np.asarray(out["main"])
        err_noisy = np.abs(noisy - clean).mean()
        err_dn = np.abs(res - clean).mean()
        assert err_dn < err_noisy * 0.6
        # edge preserved: left/right means stay far apart
        assert res[:, : w // 2 - 2].mean() < 0.2
        assert res[:, w // 2 + 2 :].mean() > 0.8


class TestStack:
    def test_compose_full_stack_runs_jitted(self):
        rs = np.random.RandomState(2)
        layers = {
            "main": jnp.asarray(rs.uniform(0, 4, (48, 64, 3)).astype(np.float32)),
            "albedo": jnp.asarray(rs.uniform(0, 1, (48, 64, 3)).astype(np.float32)),
            "normal_depth": jnp.asarray(rs.uniform(-1, 1, (48, 64, 4)).astype(np.float32)),
        }
        out, errors = comp.compose(layers, comp.STANDARD_STACK)
        assert not errors
        res = np.asarray(out["main"])
        assert np.isfinite(res).all()
        assert res.min() >= -0.05 and res.max() <= 1.1

    def test_compose_collects_errors(self):
        class Broken:
            def apply(self, layers):
                raise RuntimeError("boom")

        layers = {"main": _img()}
        out, errors = comp.compose(layers, (Broken(), comp.ToneMapper()))
        assert "Broken" in errors
        assert np.isfinite(np.asarray(out["main"])).all()
