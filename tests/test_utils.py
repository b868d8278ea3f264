"""Tests for the L0 layer: vector math, RNG, accumulator, counters, colors.

Port of the reference's property-test style (Echo.UnitTests/Common/FastMathTests.cs,
SummationTests.cs) to the TPU build.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.utils import vec, rng, accumulator, colors


class TestVec:
    def test_normalize(self):
        v = jnp.asarray([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
        n = vec.normalize(v)
        np.testing.assert_allclose(n[0], [0.6, 0.0, 0.8], atol=1e-6)
        np.testing.assert_allclose(n[1], [0.0, 0.0, 0.0], atol=1e-6)

    def test_orthonormal_frame(self):
        key = jax.random.PRNGKey(0)
        normals = vec.normalize(jax.random.normal(key, (256, 3)))
        t, b = vec.orthonormal_frame(normals)
        np.testing.assert_allclose(vec.dot(t, b), 0.0, atol=1e-5)
        np.testing.assert_allclose(vec.dot(t, normals), 0.0, atol=1e-5)
        np.testing.assert_allclose(vec.dot(b, normals), 0.0, atol=1e-5)
        np.testing.assert_allclose(vec.length(t), 1.0, atol=1e-5)
        # right-handed: t x b = n
        np.testing.assert_allclose(vec.cross(t, b), normals, atol=1e-5)

    def test_local_world_roundtrip(self):
        key = jax.random.PRNGKey(1)
        normals = vec.normalize(jax.random.normal(key, (64, 3)))
        dirs = vec.normalize(jax.random.normal(jax.random.PRNGKey(2), (64, 3)))
        t, b = vec.orthonormal_frame(normals)
        local = vec.to_local(dirs, t, b, normals)
        world = vec.to_world(local, t, b, normals)
        np.testing.assert_allclose(world, dirs, atol=1e-5)

    def test_reflect(self):
        n = jnp.asarray([0.0, 0.0, 1.0])
        i = vec.normalize(jnp.asarray([1.0, 0.0, 1.0]))
        r = vec.reflect(i, n)
        np.testing.assert_allclose(r, vec.normalize(jnp.asarray([-1.0, 0.0, 1.0])), atol=1e-6)

    def test_quaternion_identity(self):
        q = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        m = vec.quaternion_to_matrix(q)
        np.testing.assert_allclose(m, jnp.eye(3), atol=1e-6)

    def test_euler_quaternion_rotation(self):
        # 90 degrees yaw about Y: +z -> +x (left-handed-free check via matrix)
        q = vec.euler_to_quaternion([0.0, 90.0, 0.0])
        m = vec.quaternion_to_matrix(q)
        v = m @ jnp.asarray([0.0, 0.0, 1.0])
        np.testing.assert_allclose(v, [1.0, 0.0, 0.0], atol=1e-6)


class TestRng:
    def _stream(self, n=4096, sample_id=0):
        return rng.SampleStream(
            pixel_id=jnp.arange(n, dtype=jnp.uint32),
            sample_id=jnp.asarray(sample_id, jnp.uint32),
            seed=jnp.asarray(42, jnp.uint32),
        )

    def test_uniform_range_and_mean(self):
        s = self._stream()
        u = s.next_1d(dim=0)
        assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
        assert abs(float(u.mean()) - 0.5) < 0.02

    def test_deterministic(self):
        a = self._stream().next_2d(dim=3)
        b = self._stream().next_2d(dim=3)
        np.testing.assert_array_equal(a, b)

    def test_dims_decorrelated(self):
        s = self._stream()
        a, b = s.next_1d(0), s.next_1d(1)
        corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
        assert abs(corr) < 0.05

    def test_stratification_beats_white_noise(self):
        # additive-recurrence samples over sample_id should have much lower
        # discrepancy than white noise: check mean of 64 samples per pixel
        pix = jnp.zeros(1, jnp.uint32)
        vals = []
        for sid in range(64):
            s = rng.SampleStream(pix, jnp.asarray(sid, jnp.uint32), jnp.asarray(7, jnp.uint32))
            vals.append(float(s.next_1d(0)[0]))
        # stratified-with-jitter mean std ~0.005; white noise would be ~0.036
        assert abs(np.mean(vals) - 0.5) < 0.02

    def test_no_shared_keys_camera_vs_bounce(self):
        """No bounce-dim draw may share its underlying hash key with a
        camera draw (the round-1 depth-0 collision reused the pixel-jitter
        sample as the first BSDF direction). Checks the draw VALUES over a
        sample stream: identical keys would give identical sequences."""
        from echorenderer_tpu.evaluation.integrators import (
            BOUNCE_DIM_STRIDE,
            CAMERA_DIMS,
            DIM_BSDF,
            DIM_LIGHT_PICK,
            DIM_LIGHT_SAMPLE,
            DIM_LOBE,
            DIM_RR,
        )

        pix = jnp.zeros(1, jnp.uint32)
        camera_dims = list(range(CAMERA_DIMS))
        bounce0 = [
            CAMERA_DIMS + BOUNCE_DIM_STRIDE * 0 + k
            for k in (DIM_BSDF, DIM_LOBE, DIM_LIGHT_PICK, DIM_LIGHT_SAMPLE, DIM_RR)
        ]
        assert min(bounce0) >= CAMERA_DIMS  # key spaces disjoint by layout

        def seq2(dim):
            out = []
            for sid in range(32):
                s = rng.SampleStream(pix, jnp.asarray(sid, jnp.uint32), jnp.asarray(0, jnp.uint32))
                out.append(np.asarray(s.next_2d(dim)[0]))
            return np.stack(out)

        cam = [seq2(d) for d in camera_dims]
        for bd in bounce0:
            b = seq2(bd)
            for c in cam:
                assert not np.allclose(b, c), f"bounce dim {bd} reuses a camera stream"

    def test_pairwise_dims_cover_product_space(self):
        """Owen scrambling must break the additive-recurrence lattice: the
        (dim a, dim b) pairs of one pixel's stream must not collapse onto a
        line u_a - u_b = const (the Cranley-Parterson failure mode)."""
        pix = jnp.zeros(1, jnp.uint32)
        a, b = [], []
        for sid in range(256):
            s = rng.SampleStream(pix, jnp.asarray(sid, jnp.uint32), jnp.asarray(3, jnp.uint32))
            a.append(float(s.next_1d(0)[0]))
            b.append(float(s.next_1d(5)[0]))
        diff = (np.asarray(a) - np.asarray(b)) % 1.0
        # on a lattice line the fractional difference is a single constant;
        # after scrambling it should fill [0,1): demand broad spread
        assert diff.std() > 0.15, f"dims still lattice-coupled (std {diff.std():.4f})"

    def test_owen_scramble_preserves_stratification(self):
        """The scramble is a dyadic-interval permutation: 2^k prefixes stay
        stratified (each half/quarter/eighth gets its fair share)."""
        pix = jnp.zeros(1, jnp.uint32)
        vals = []
        for sid in range(64):
            s = rng.SampleStream(pix, jnp.asarray(sid, jnp.uint32), jnp.asarray(9, jnp.uint32))
            vals.append(float(s.next_1d(7)[0]))
        vals = np.asarray(vals)
        for k in (2, 4, 8):
            counts = np.histogram(vals, bins=k, range=(0.0, 1.0))[0]
            assert counts.min() >= 64 // k - 2 and counts.max() <= 64 // k + 2, (
                f"bins {k}: {counts}"
            )

    def test_uniform_sphere(self):
        s = self._stream(8192)
        d = rng.uniform_sphere(s.next_2d(0))
        np.testing.assert_allclose(vec.length(d), 1.0, atol=1e-5)
        assert float(jnp.abs(d.mean(axis=0)).max()) < 0.05

    def test_cosine_hemisphere_pdf(self):
        # E[cos theta] under cosine-weighted sampling = 2/3
        s = self._stream(16384)
        d = rng.cosine_hemisphere(s.next_2d(0))
        assert float(d[..., 2].min()) >= 0.0
        assert abs(float(d[..., 2].mean()) - 2.0 / 3.0) < 0.01

    def test_concentric_disk(self):
        s = self._stream(8192)
        d = rng.concentric_disk(s.next_2d(0))
        r2 = d[..., 0] ** 2 + d[..., 1] ** 2
        assert float(r2.max()) <= 1.0 + 1e-5
        assert abs(float(r2.mean()) - 0.5) < 0.02  # uniform disk => E[r^2]=1/2

    def test_uniform_triangle(self):
        s = self._stream(8192)
        b = rng.uniform_triangle(s.next_2d(0))
        assert float((b.sum(axis=-1)).max()) <= 1.0 + 1e-5
        assert float(b.min()) >= 0.0
        # uniform over the unit right triangle => E[b0] = 1/3
        assert abs(float(b[..., 0].mean()) - 1.0 / 3.0) < 0.02


class TestAccumulator:
    def test_mean_and_variance(self):
        acc = accumulator.create((1,), channels=1)
        samples = np.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
        for v in samples:
            acc = accumulator.add(acc, jnp.full((1, 1), v))
        np.testing.assert_allclose(acc.mean, samples.mean(), rtol=1e-6)
        np.testing.assert_allclose(
            accumulator.variance(acc), samples.var(ddof=1), rtol=1e-5
        )
        assert float(acc.count[0, 0]) == 5.0

    def test_rejects_non_finite(self):
        acc = accumulator.create((1,), channels=1)
        acc = accumulator.add(acc, jnp.full((1, 1), 2.0))
        acc = accumulator.add(acc, jnp.full((1, 1), jnp.inf))
        acc = accumulator.add(acc, jnp.full((1, 1), jnp.nan))
        assert float(acc.count[0, 0]) == 1.0
        np.testing.assert_allclose(acc.mean, 2.0)

    def test_noise_matches_reference_formula(self):
        acc = accumulator.create((1,), channels=1)
        samples = [1.0, 2.0, 3.0, 4.0]
        for v in samples:
            acc = accumulator.add(acc, jnp.full((1, 1), v))
        n = len(samples)
        m2 = float(acc.m2[0, 0])
        mean = float(acc.mean[0, 0])
        expected = np.sqrt(m2 / ((n - 1) ** 3 * mean**2))
        np.testing.assert_allclose(accumulator.noise(acc)[0, 0], expected, rtol=1e-5)

    def test_noise_zero_cases(self):
        acc = accumulator.create((1,), channels=1)
        assert float(accumulator.noise(acc)[0, 0]) == 0.0
        acc = accumulator.add(acc, jnp.ones((1, 1)))
        assert float(accumulator.noise(acc)[0, 0]) == 0.0

    def test_add_many_matches_sequential(self):
        rs = np.random.RandomState(3)
        samples = rs.rand(17, 1, 3).astype(np.float32)
        seq = accumulator.create((1,))
        for s in samples:
            seq = accumulator.add(seq, jnp.asarray(s))
        merged = accumulator.create((1,))
        merged = accumulator.add_many(
            merged,
            jnp.asarray(samples.sum(0)),
            jnp.asarray((samples**2).sum(0)),
            jnp.full((1, 1), float(len(samples))),
        )
        np.testing.assert_allclose(merged.mean, seq.mean, rtol=1e-4)
        np.testing.assert_allclose(merged.m2, seq.m2, rtol=1e-3, atol=1e-5)


class TestColors:
    def test_luminance_white(self):
        assert abs(float(colors.luminance(jnp.ones(3))) - 1.0) < 1e-4

    def test_srgb_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 64)
        np.testing.assert_allclose(colors.srgb_decode(colors.srgb_encode(x)), x, atol=1e-5)

    def test_parse_hex(self):
        c = colors.parse_color("#FF0000")
        np.testing.assert_allclose(c, [1.0, 0.0, 0.0, 1.0], atol=1e-6)
        c = colors.parse_color("#808080")
        assert 0.21 < c[0] < 0.22  # linearized mid gray

    def test_parse_hdr(self):
        c = colors.parse_color("hdr(2.5, 1.0, 0.5)")
        np.testing.assert_allclose(c, [2.5, 1.0, 0.5, 1.0], atol=1e-6)

    def test_parse_rgb(self):
        c = colors.parse_color("rgb(255, 255, 255)")
        np.testing.assert_allclose(c, [1.0, 1.0, 1.0, 1.0], atol=1e-6)


class TestKahanSum:
    def test_compensated_beats_naive(self):
        """Port of the reference SummationTests: summing many tiny values
        onto a large one must not lose them."""
        import numpy as np
        from echorenderer_tpu.utils import vec

        n = 4096
        vals = np.full(n, 0.0001, np.float32)
        vals[0] = 1e4
        exact = 1e4 + 0.0001 * (n - 1)
        kahan = float(vec.kahan_sum(jnp.asarray(vals)))
        naive = float(jnp.sum(jnp.asarray(vals)))
        assert abs(kahan - exact) < abs(naive - exact)
        np.testing.assert_allclose(kahan, exact, rtol=1e-7)

    def test_batched(self):
        import numpy as np
        from echorenderer_tpu.utils import vec

        rs = np.random.RandomState(0)
        x = rs.uniform(-1, 1, (256, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(vec.kahan_sum(jnp.asarray(x))), x.astype(np.float64).sum(0),
            rtol=1e-6,
        )


class TestCameras:
    def test_orthographic_parallel_rays(self):
        import numpy as np
        from echorenderer_tpu.scene import OrthographicCamera, Scene
        from echorenderer_tpu.scene.prepare import prepare_scene
        from echorenderer_tpu.scene.cameras import spawn_rays
        from echorenderer_tpu.scene import SphereEntity
        from echorenderer_tpu.scene.materials import Diffuse

        s = Scene()
        s.add(SphereEntity(material=Diffuse()))
        s.add(OrthographicCamera(width=4.0, position=(0, 0, -5)))
        prep = prepare_scene(s)
        xy = jnp.asarray([[0, 0], [31, 23], [15, 12]], jnp.int32)
        shift = jnp.full((3, 2), 0.5)
        o, d = spawn_rays(prep.camera, xy, shift, shift, (32, 24))
        # all directions identical (parallel projection), origins differ
        np.testing.assert_allclose(np.asarray(d[0]), np.asarray(d[1]), atol=1e-6)
        assert np.abs(np.asarray(o[0]) - np.asarray(o[1])).max() > 1.0

    def test_cylindrical_covers_azimuth(self):
        import numpy as np
        from echorenderer_tpu.scene import CylindricalCamera, Scene, SphereEntity
        from echorenderer_tpu.scene.materials import Diffuse
        from echorenderer_tpu.scene.prepare import prepare_scene
        from echorenderer_tpu.scene.cameras import spawn_rays

        s = Scene()
        s.add(SphereEntity(material=Diffuse()))
        s.add(CylindricalCamera(position=(0, 0, 0)))
        prep = prepare_scene(s)
        w = 64
        xy = jnp.stack([jnp.arange(w, dtype=jnp.int32), jnp.full(w, 16, jnp.int32)], -1)
        shift = jnp.full((w, 2), 0.5)
        o, d = spawn_rays(prep.camera, xy, shift, shift, (w, 32))
        # a horizontal scanline sweeps the full 360 degrees of azimuth
        phi = np.unwrap(np.arctan2(np.asarray(d[:, 0]), np.asarray(d[:, 2])))
        assert abs(abs(phi[-1] - phi[0]) - 2 * np.pi * (w - 1) / w) < 0.1
        np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-6)
