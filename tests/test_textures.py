"""Texture & distribution tests, modeled on the reference's
DirectionalTextureTests (env-map average vs Monte Carlo, importance-sample
pdf consistency) and DiscreteDistribution1Tests (CDF inversion)."""

import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.textures import (
    ArrayGrid,
    CloudTexture,
    ColorfulDirectionalTexture,
    CylindricalTexture,
    Gradient,
    GradientTexture,
    Pure,
    fbm_noise,
    simplex_noise,
)
from echorenderer_tpu.utils import distributions, rng


class TestDistribution1D:
    def test_cdf_inversion_matches_histogram(self):
        w = np.asarray([1.0, 0.0, 3.0, 2.0, 0.0, 4.0])
        d = distributions.build_1d(w)
        u = (np.arange(4096) + 0.5) / 4096
        idx, pmf, remap = d.sample(jnp.asarray(u, jnp.float32))
        counts = np.bincount(np.asarray(idx), minlength=6) / 4096
        np.testing.assert_allclose(counts, w / w.sum(), atol=2e-3)
        # zero-weight bins never sampled
        assert counts[1] == 0 and counts[4] == 0
        # remapped u stays in [0, 1)
        r = np.asarray(remap)
        assert (r >= 0).all() and (r < 1).all()

    def test_pmf_of(self):
        d = distributions.build_1d([2.0, 6.0])
        np.testing.assert_allclose(np.asarray(d.pmf_of(jnp.asarray([0, 1]))), [0.25, 0.75])


class TestDistribution2D:
    def test_marginal_conditional(self):
        w = np.asarray([[1.0, 1.0], [0.0, 6.0]])
        d = distributions.build_2d(w)
        n = 64
        u = rng.SampleStream(
            pixel_id=jnp.arange(n * n, dtype=jnp.uint32),
            sample_id=jnp.asarray(0, jnp.uint32),
            seed=jnp.asarray(7, jnp.uint32),
        ).next_2d(0)
        iy, ix, pmf, _ = d.sample(u)
        flat = np.asarray(iy) * 2 + np.asarray(ix)
        counts = np.bincount(flat, minlength=4) / (n * n)
        np.testing.assert_allclose(counts, (w / w.sum()).ravel(), atol=0.02)
        # pmf_of agrees with sampled pmf
        np.testing.assert_allclose(np.asarray(d.pmf_of(iy, ix)), np.asarray(pmf), rtol=1e-5)


class TestGrids:
    def test_pure_average(self):
        p = Pure((0.25, 0.5, 0.75))
        np.testing.assert_allclose(p.average()[:3], [0.25, 0.5, 0.75])

    def test_bilinear_interpolation(self):
        tex = ArrayGrid(np.asarray([[[0.0, 0, 0, 1], [1.0, 1, 1, 1]]]), wrap="clamp")
        g = tex.prepare()
        # halfway between the two texels
        mid = g.sample_uv(jnp.asarray([[0.5, 0.5]]))
        np.testing.assert_allclose(np.asarray(mid)[0, :3], [0.5, 0.5, 0.5], atol=1e-6)

    def test_wrap_modes(self):
        arr = np.zeros((1, 4, 4), np.float32)
        arr[0, :, 0] = np.arange(4)
        tex_r = ArrayGrid(arr, wrap="repeat", filter="point").prepare()
        tex_c = ArrayGrid(arr, wrap="clamp", filter="point").prepare()
        u = jnp.asarray([[1.1, 0.5]])  # past the right edge
        r = float(tex_r.sample_uv(u)[0, 0])
        c = float(tex_c.sample_uv(u)[0, 0])
        assert r == pytest.approx(0.0)  # wrapped to texel 0
        assert c == pytest.approx(3.0)  # clamped to last texel

    def test_gradient_texture(self):
        g = GradientTexture(start=(0, 0, 0), end=(1, 1, 1), axis=0).prepare()
        lo = np.asarray(g.sample_uv(jnp.asarray([[0.01, 0.5]])))[0, 0]
        hi = np.asarray(g.sample_uv(jnp.asarray([[0.99, 0.5]])))[0, 0]
        assert lo < 0.05 and hi > 0.95


class TestProcedural:
    def test_simplex_range_and_determinism(self):
        x, y = np.meshgrid(np.linspace(0, 8, 64), np.linspace(0, 8, 64))
        n1 = simplex_noise(x, y, seed=3)
        n2 = simplex_noise(x, y, seed=3)
        np.testing.assert_array_equal(n1, n2)
        assert n1.min() >= -1.01 and n1.max() <= 1.01
        assert n1.std() > 0.05  # actually varies

    def test_fbm_smoother_than_single_octave(self):
        x, y = np.meshgrid(np.linspace(0, 4, 128), np.linspace(0, 4, 128))
        f = fbm_noise(x, y, octaves=5, seed=1)
        assert np.isfinite(f).all()

    def test_gradient_ramp(self):
        g = Gradient([(0.0, (0, 0, 0)), (1.0, (1, 0, 0))])
        np.testing.assert_allclose(g(0.5)[:3], [0.5, 0, 0], atol=1e-6)

    def test_cloud_texture_bakes(self):
        c = CloudTexture(resolution=(32, 32))
        d = c.data()
        assert d.shape == (32, 32, 4)
        assert np.isfinite(d).all()


class TestDirectional:
    def _env(self):
        h, w = 32, 64
        img = np.full((h, w, 3), 0.1, np.float32)
        img[24:, :, :] = [5.0, 4.0, 3.0]  # bright band near the top (v->1 is up)
        return CylindricalTexture(img).prepare()

    def test_average_vs_monte_carlo(self):
        env = self._env()
        u = rng.SampleStream(
            pixel_id=jnp.arange(4096, dtype=jnp.uint32),
            sample_id=jnp.asarray(0, jnp.uint32),
            seed=jnp.asarray(11, jnp.uint32),
        ).next_2d(0)
        dirs = rng.uniform_sphere(u)
        mc = np.asarray(env.evaluate(dirs)).mean(axis=0)
        avg = np.asarray(env.average())
        np.testing.assert_allclose(mc, avg, rtol=0.15)

    def test_importance_sampling_estimates_average(self):
        """E[L(w)/pdf(w)] / (4 pi) over importance samples == mean radiance."""
        env = self._env()
        u = rng.SampleStream(
            pixel_id=jnp.arange(8192, dtype=jnp.uint32),
            sample_id=jnp.asarray(0, jnp.uint32),
            seed=jnp.asarray(13, jnp.uint32),
        ).next_2d(1)
        d, pdf = env.sample(u)
        lum = np.asarray(env.evaluate(d)).mean(axis=-1)
        est = (lum / np.maximum(np.asarray(pdf), 1e-12)).mean() / (4 * np.pi)
        ref = np.asarray(env.average()).mean()
        np.testing.assert_allclose(est, ref, rtol=0.1)

    def test_pdf_matches_sample(self):
        env = self._env()
        u = rng.SampleStream(
            pixel_id=jnp.arange(256, dtype=jnp.uint32),
            sample_id=jnp.asarray(0, jnp.uint32),
            seed=jnp.asarray(17, jnp.uint32),
        ).next_2d(2)
        d, pdf = env.sample(u)
        pdf2 = env.pdf(d)
        np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-3)

    def test_colorful_pattern_octants(self):
        env = ColorfulDirectionalTexture().prepare()
        up = np.asarray(env.evaluate(jnp.asarray([[0.0, 1.0, 0.0]])))
        down = np.asarray(env.evaluate(jnp.asarray([[0.0, -1.0, 0.0]])))
        assert up[0, 1] > down[0, 1]  # +y octant brighter in green channel


class TestImages:
    def test_png_roundtrip(self, tmp_path):
        from echorenderer_tpu.io import images

        img = np.random.RandomState(0).uniform(0, 1, (8, 12, 3)).astype(np.float32)
        p = tmp_path / "t.png"
        images.save_png(p, img, srgb=False)
        back = images.load_png(p, srgb=False)
        np.testing.assert_allclose(back[..., :3], img, atol=1 / 255 + 1e-3)

    def test_fpi_lossless_roundtrip(self, tmp_path):
        from echorenderer_tpu.io import images

        img = np.random.RandomState(1).uniform(-4, 40, (6, 5, 3)).astype(np.float32)
        p = tmp_path / "t.fpi"
        images.save_fpi(p, img)
        np.testing.assert_array_equal(images.load_fpi(p), img)

    def test_hdr_roundtrip(self, tmp_path):
        from echorenderer_tpu.io import images

        img = np.random.RandomState(2).uniform(0, 30, (7, 9, 3)).astype(np.float32)
        p = tmp_path / "t.hdr"
        images.save_hdr(p, img)
        back = images.load_hdr(p)
        # RGBE shares one exponent per pixel: error bound is the pixel's
        # max channel / 2^8 (half a mantissa step after centered decode)
        bound = img.max(axis=-1, keepdims=True) / 256.0 + 1e-3
        assert (np.abs(back - img) <= bound).all()

    def test_pfm_roundtrip(self, tmp_path):
        from echorenderer_tpu.io import images

        img = np.random.RandomState(3).uniform(-2, 2, (4, 6, 3)).astype(np.float32)
        p = tmp_path / "t.pfm"
        images.save_pfm(p, img)
        np.testing.assert_allclose(images.load_pfm(p), img, rtol=1e-6)

    def test_exr_roundtrip(self, tmp_path):
        from echorenderer_tpu.io import images

        img = np.random.RandomState(4).uniform(0, 50, (6, 9, 3)).astype(np.float32)
        p = tmp_path / "t.exr"
        images.save(p, img)
        back = images.load(p)
        np.testing.assert_allclose(back, img, atol=1e-6)

    def test_exr_rgba(self, tmp_path):
        from echorenderer_tpu.io.exr import load_exr, save_exr

        img = np.random.RandomState(5).uniform(0, 2, (5, 7, 4)).astype(np.float32)
        p = tmp_path / "a.exr"
        save_exr(p, img)
        np.testing.assert_allclose(load_exr(p), img, atol=1e-6)

    def test_exr_zip_roundtrip(self, tmp_path):
        """ZIP-compressed EXR (what real HDR environment assets use):
        16-scanline blocks, interleave+predictor+deflate transform."""
        from echorenderer_tpu.io.exr import load_exr, save_exr

        # smooth HDR-like gradient: compresses well, exercises the
        # keep-compressed branch; 37 rows = ragged final 16-line block
        y, x = np.mgrid[0:37, 0:23].astype(np.float32)
        img = np.stack([y * 0.1, x * 0.2, (x + y) * 0.05], -1)
        p = tmp_path / "z.exr"
        save_exr(p, img, compression="zip")
        save_exr(tmp_path / "n.exr", img)
        assert p.stat().st_size < (tmp_path / "n.exr").stat().st_size / 2
        np.testing.assert_array_equal(load_exr(p), img)
