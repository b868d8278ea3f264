"""Light tree tests (reference Aggregation/Selection/LightTree.cs behavior:
probabilistic descent consistency, pmf replay via branch bitmasks)."""

import jax.numpy as jnp
import numpy as np

from echorenderer_tpu.aggregation.light_tree import (
    build_light_tree,
    pick,
    pmf_of_light,
)


def _random_lights(n, seed=0):
    rs = np.random.RandomState(seed)
    center = rs.uniform(-10, 10, (n, 3))
    radius = rs.uniform(0.0, 0.5, n)
    axis = rs.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    theta_o = np.full(n, np.pi)  # omni
    theta_e = np.full(n, np.pi / 2)
    power = rs.uniform(0.1, 5.0, n)
    return center, radius, axis, theta_o, theta_e, power


class TestLightTree:
    def test_pick_distribution_matches_pmf(self):
        n = 13
        tree = build_light_tree(*_random_lights(n))
        x = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]]), (8192, 1))
        u = (jnp.arange(8192, dtype=jnp.float32) + 0.5) / 8192
        leaf, pmf = pick(tree, x, u)
        leaf = np.asarray(leaf)
        counts = np.bincount(leaf, minlength=n) / leaf.shape[0]
        # empirical frequency ~ analytic pmf for every light
        x1 = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]]), (n, 1))
        analytic = np.asarray(pmf_of_light(tree, jnp.arange(n), x1))
        np.testing.assert_allclose(counts, analytic, atol=0.02)
        np.testing.assert_allclose(analytic.sum(), 1.0, rtol=1e-4)

    def test_pick_pmf_matches_replay(self):
        tree = build_light_tree(*_random_lights(20, seed=3))
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.uniform(-5, 5, (256, 3)).astype(np.float32))
        u = jnp.asarray(rs.uniform(0, 1, 256).astype(np.float32))
        leaf, pmf = pick(tree, x, u)
        replay = pmf_of_light(tree, leaf, x)
        np.testing.assert_allclose(np.asarray(pmf), np.asarray(replay), rtol=1e-3)

    def test_nearby_light_preferred(self):
        """A shading point next to light 0 should pick it far more often
        than the distant equal-power lights — the whole point of the tree."""
        center = np.asarray([[0.0, 0, 0], [50, 0, 0], [0, 50, 0], [0, 0, 50],
                             [50, 50, 0], [50, 0, 50], [0, 50, 50], [50, 50, 50]])
        n = len(center)
        tree = build_light_tree(
            center, np.zeros(n), np.tile([0.0, 0, 1], (n, 1)),
            np.full(n, np.pi), np.full(n, np.pi / 2), np.ones(n),
        )
        x = jnp.tile(jnp.asarray([[0.5, 0.0, 0.0]]), (n, 1))
        p = np.asarray(pmf_of_light(tree, jnp.arange(n), x))
        # cluster-level importance is conservative near the root, so the
        # near light doesn't get ~all the mass — but it must dominate
        assert p[0] == p.max() and p[0] > 4.0 * np.delete(p, 0).max()
        np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-4)

    def test_single_light(self):
        tree = build_light_tree(*_random_lights(1))
        x = jnp.zeros((4, 3))
        u = jnp.asarray([0.1, 0.4, 0.6, 0.9])
        leaf, pmf = pick(tree, x, u)
        np.testing.assert_array_equal(np.asarray(leaf), 0)
        np.testing.assert_allclose(np.asarray(pmf), 1.0, rtol=1e-5)


class TestSceneIntegration:
    def test_many_lights_uses_tree_and_renders(self):
        import jax

        from echorenderer_tpu.models import scenes
        from echorenderer_tpu.processes.render import _sample_frame
        from echorenderer_tpu.scene.prepare import prepare_scene

        prepared = prepare_scene(scenes.many_lights(count=80))
        assert prepared.lights.tree is not None
        s_sum, s_sq = jax.jit(
            lambda sc: _sample_frame(sc, "path", (16, 12), 0, jnp.uint32(0), 2, 4, 2.5)
        )(prepared)
        assert bool(jnp.isfinite(s_sum).all())
        assert float(s_sum.max()) > 0.0

    def test_tree_vs_flat_unbiased(self):
        """Tree and flat CDF sampling estimate the same radiance (the tree
        only reshapes variance). Cornell-style few-light scene forced onto
        the tree path vs flat."""
        import jax

        from echorenderer_tpu.models import scenes
        from echorenderer_tpu.processes.render import _sample_frame
        from echorenderer_tpu.scene import prepare as prep_mod

        old = prep_mod.LIGHT_TREE_THRESHOLD
        try:
            prep_mod.LIGHT_TREE_THRESHOLD = 1
            with_tree = prep_mod.prepare_scene(scenes.many_lights(count=12, seed=2))
            prep_mod.LIGHT_TREE_THRESHOLD = 10**9
            flat = prep_mod.prepare_scene(scenes.many_lights(count=12, seed=2))
        finally:
            prep_mod.LIGHT_TREE_THRESHOLD = old
        assert with_tree.lights.tree is not None and flat.lights.tree is None

        def mean_img(sc, spp):
            s_sum, _ = jax.jit(
                lambda s: _sample_frame(s, "path", (24, 16), 0, jnp.uint32(0), spp, 4, 2.5)
            )(sc)
            return np.asarray(s_sum) / spp

        a = mean_img(with_tree, 96)
        b = mean_img(flat, 96)
        # identical expectation within Monte Carlo tolerance
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.06)
