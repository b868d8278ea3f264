"""BSDF property tests, porting the spirit of the reference's BxDFTests
(Echo.UnitTests/Evaluation/BxDFTests.cs): for a table of parameterized
materials, draw many samples and assert
  - `sample` and `pdf` agree on the sampled directions,
  - `sample.value` equals `evaluate` on the sampled directions,
  - white-furnace energy conservation: E[f cos / pdf] <= 1 (+MC slack),
  - Helmholtz reciprocity for the diffuse models.
Sampling uses the deterministic counter-based streams (fixed seeds),
mirroring the reference's seeded stratified distributions."""

import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.evaluation import bsdf
from echorenderer_tpu.scene import materials as mats
from echorenderer_tpu.utils import rng

N = 4096


def gathered(mat, n=N):
    m, one_sided = (mat.base, 1) if isinstance(mat, mats.OneSided) else (mat, 0)
    return bsdf.GatheredMaterial(
        type=jnp.full((n,), m.type_id, jnp.int32),
        albedo=jnp.tile(jnp.asarray(m.constant_albedo()), (n, 1)),
        params=jnp.tile(jnp.asarray(m.params()), (n, 1)),
        extra=jnp.tile(jnp.asarray(m.extra_color()), (n, 1)),
    )


def outgoing(seed, n=N, upper_only=False):
    s = rng.SampleStream(
        pixel_id=jnp.arange(n, dtype=jnp.uint32),
        sample_id=jnp.asarray(0, jnp.uint32),
        seed=jnp.asarray(seed, jnp.uint32),
    )
    wo = rng.uniform_sphere(s.next_2d(7))
    if upper_only:
        wo = wo * jnp.asarray([1.0, 1.0, 0.0]) + jnp.abs(wo) * jnp.asarray([0, 0, 1.0])
    # avoid grazing directions where every model degenerates numerically
    wo = jnp.where(jnp.abs(wo[..., 2:3]) < 0.05, wo + jnp.asarray([0, 0, 0.1]), wo)
    return wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)


def draws(seed, n=N):
    s = rng.SampleStream(
        pixel_id=jnp.arange(n, dtype=jnp.uint32),
        sample_id=jnp.asarray(1, jnp.uint32),
        seed=jnp.asarray(seed, jnp.uint32),
    )
    return s.next_2d(3), s.next_1d(4)


# the parameterized material table (BxDFTests.cs:49-80 analogue)
TABLE = [
    ("lambert", mats.Diffuse(albedo=(1, 1, 1), roughness=0.0)),
    ("oren-nayar", mats.Diffuse(albedo=(1, 1, 1), roughness=0.7)),
    ("diffuse-transmit", mats.Diffuse(albedo=(1, 1, 1), roughness=0.0, transmissive=True)),
    ("dielectric-rough", mats.Dielectric(albedo=(1, 1, 1), roughness=0.4, refractive_index=1.5)),
    ("conductor-rough", mats.Conductor(albedo=(0.9, 0.7, 0.4), roughness=0.3)),
    ("conductor-glossy", mats.Conductor(albedo=(1, 1, 1), edge=(1, 1, 1), roughness=0.15)),
    ("coated-diffuse", mats.CoatedDiffuse(albedo=(0.8, 0.8, 0.8), refractive_index=1.5)),
]

NON_SPECULAR = [t for t in TABLE if t[0] != "dielectric-smooth"]


@pytest.mark.parametrize("name,mat", TABLE, ids=[t[0] for t in TABLE])
class TestBxDFTable:
    def test_sample_pdf_consistency(self, name, mat):
        """pdf(wo, sampled wi) must equal the pdf `sample` reported."""
        g = gathered(mat)
        wo = outgoing(11)
        u2, ul = draws(12)
        bs = bsdf.sample(g, wo, u2, ul)
        valid = np.asarray((bs.pdf > 1e-5) & ~bs.specular)
        if valid.sum() == 0:
            pytest.skip("all-specular material")
        p2 = np.asarray(bsdf.pdf(g, wo, bs.incident))
        p1 = np.asarray(bs.pdf)
        rel = np.abs(p1 - p2)[valid] / np.maximum(p1[valid], 1e-5)
        # medians must agree tightly; allow a small tail of edge directions
        assert np.median(rel) < 2e-3, f"{name}: median rel {np.median(rel)}"
        assert (rel < 0.05).mean() > 0.95, f"{name}: {1 - (rel < 0.05).mean():.3f} outliers"

    def test_sample_value_matches_evaluate(self, name, mat):
        g = gathered(mat)
        wo = outgoing(21)
        u2, ul = draws(22)
        bs = bsdf.sample(g, wo, u2, ul)
        valid = np.asarray((bs.pdf > 1e-5) & ~bs.specular)
        if valid.sum() == 0:
            pytest.skip("all-specular material")
        ev = np.asarray(bsdf.evaluate(g, wo, bs.incident))
        sv = np.asarray(bs.value)
        rel = np.abs(ev - sv)[valid] / np.maximum(sv[valid], 1e-4)
        assert np.median(rel) < 2e-3, f"{name}: median rel {np.median(rel)}"
        assert (rel < 0.05).mean() > 0.95

    def test_energy_conservation(self, name, mat):
        """White furnace: E[f cos / pdf] <= 1 for unit-albedo materials
        (BxDFTests energy conservation)."""
        g = gathered(mat)
        wo = outgoing(31, upper_only=True)
        u2, ul = draws(32)
        bs = bsdf.sample(g, wo, u2, ul)
        cos_i = np.abs(np.asarray(bs.incident[..., 2]))
        w = np.asarray(bs.value).max(-1) * cos_i / np.maximum(np.asarray(bs.pdf), 1e-8)
        w = np.where(np.asarray(bs.pdf) > 1e-6, w, 0.0)
        mean = w.mean()
        assert mean < 1.05, f"{name}: mean weight {mean:.3f} gains energy"
        assert mean > 0.05, f"{name}: mean weight {mean:.3f} suspiciously dark"


class TestReciprocity:
    @pytest.mark.parametrize("rough", [0.0, 0.5, 1.0])
    def test_diffuse_reciprocity(self, rough):
        mat = mats.Diffuse(albedo=(1, 1, 1), roughness=rough)
        g = gathered(mat, 512)
        wo = outgoing(41, 512)
        wi = outgoing(42, 512)
        f_ab = np.asarray(bsdf.evaluate(g, wo, wi))
        f_ba = np.asarray(bsdf.evaluate(g, wi, wo))
        np.testing.assert_allclose(f_ab, f_ba, atol=1e-5)


class TestSmoothDielectric:
    def test_unit_weight_and_flags(self):
        """Specular dielectric: weight = value*cos/pdf must be <= 1 (Fresnel
        splits energy), every sample flagged specular."""
        g = gathered(mats.Dielectric(albedo=(1, 1, 1), roughness=0.0, refractive_index=1.5))
        wo = outgoing(51)
        u2, ul = draws(52)
        bs = bsdf.sample(g, wo, u2, ul)
        assert bool(np.asarray(bs.specular).all())
        cos_i = np.abs(np.asarray(bs.incident[..., 2]))
        w = np.asarray(bs.value).max(-1) * cos_i / np.maximum(np.asarray(bs.pdf), 1e-8)
        # every weight is one of: reflection (1), transmission entering
        # ((1/eta)^2 = 0.444 radiance compression) or exiting (eta^2 = 2.25)
        expected = np.asarray([1.0, 1.0 / 1.5**2, 1.5**2])
        dist = np.abs(w[:, None] - expected[None, :]).min(-1)
        assert dist.max() < 1e-3, f"unexpected weights {np.unique(w.round(3))}"

    def test_total_internal_reflection(self):
        """Grazing exit from inside glass must reflect, not refract."""
        g = gathered(mats.Dielectric(albedo=(1, 1, 1), roughness=0.0, refractive_index=1.5), 8)
        # wo below surface (inside), steep grazing angle -> TIR
        wo = jnp.tile(jnp.asarray([[0.9, 0.0, -np.sqrt(1 - 0.81)]]), (8, 1))
        u2 = jnp.full((8, 2), 0.99)
        ul = jnp.full((8,), 0.999)  # would pick transmission if allowed
        bs = bsdf.sample(g, wo, u2, ul)
        # reflected ray stays in wo's hemisphere
        assert bool((np.asarray(bs.incident[..., 2]) < 0).all())


class TestMappings:
    def test_cosine_hemisphere_pdf(self):
        """Sampled density matches cos/pi via histogram over cos theta."""
        s = rng.SampleStream(
            pixel_id=jnp.arange(1 << 14, dtype=jnp.uint32),
            sample_id=jnp.asarray(0, jnp.uint32),
            seed=jnp.asarray(5, jnp.uint32),
        )
        wi = rng.cosine_hemisphere(s.next_2d(0))
        z = np.asarray(wi[..., 2])
        assert (z >= 0).all()
        # P(cos > c) should be 1 - c^2
        for c in (0.25, 0.5, 0.75):
            np.testing.assert_allclose((z > c).mean(), 1 - c * c, atol=0.02)

    def test_uniform_sphere_mean(self):
        s = rng.SampleStream(
            pixel_id=jnp.arange(1 << 14, dtype=jnp.uint32),
            sample_id=jnp.asarray(0, jnp.uint32),
            seed=jnp.asarray(6, jnp.uint32),
        )
        d = np.asarray(rng.uniform_sphere(s.next_2d(0)))
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        assert np.abs(d.mean(0)).max() < 0.02
