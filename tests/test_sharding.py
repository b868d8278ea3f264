"""Multi-chip SPMD tests on the virtual CPU mesh: chip-count invariance
(SURVEY.md §4 — the analogue of 'multi-node without a real cluster')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from echorenderer_tpu.models import scenes
from echorenderer_tpu.parallel import make_mesh, render_epoch_sharded
from echorenderer_tpu.scene.prepare import prepare_scene


@pytest.fixture(scope="module")
def prepared():
    return prepare_scene(scenes.cornell_box())


RES = (32, 24)


class TestChipCountInvariance:
    def test_1_vs_8_shards_bit_identical(self, prepared):
        """The image must not depend on the shard count: RNG is keyed by
        absolute pixel id (the reference's scheduling-independent sample
        streams, ContinuousDistribution.cs)."""
        mesh1 = make_mesh(1)
        mesh8 = make_mesh(8)
        a, a2, na = render_epoch_sharded(mesh1, prepared, RES, 0, 0, 2, bounce_limit=4)
        b, b2, nb = render_epoch_sharded(mesh8, prepared, RES, 0, 0, 2, bounce_limit=4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))

    def test_psum_counts_all_samples(self, prepared):
        mesh8 = make_mesh(8)
        _, _, n = render_epoch_sharded(mesh8, prepared, RES, 0, 0, 2, bounce_limit=4)
        padded = -(-RES[0] * RES[1] // 8) * 8
        assert float(np.asarray(n)[0]) == padded * 2

    def test_matches_single_chip_renderer(self, prepared):
        """Sharded output equals the unsharded _sample_frame path."""
        from echorenderer_tpu.processes.render import _sample_frame_jit

        mesh8 = make_mesh(8)
        a, _, _ = render_epoch_sharded(mesh8, prepared, RES, 0, 0, 2, bounce_limit=4)
        b, _ = _sample_frame_jit(
            prepared, "path", RES, 0, jnp.asarray(0, jnp.uint32), 2, 4, 2.5
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_seed_changes_image(self, prepared):
        mesh8 = make_mesh(8)
        a, _, _ = render_epoch_sharded(mesh8, prepared, RES, 0, 0, 2, bounce_limit=4)
        c, _, _ = render_epoch_sharded(mesh8, prepared, RES, 7, 0, 2, bounce_limit=4)
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0.0


class TestAdaptiveSharded:
    def test_active_epoch_shard_invariant_and_matches_single(self, prepared):
        """sample_active_sharded (the adaptive epoch under a mesh) is
        bitwise identical across shard counts AND to the single-device
        adaptive program (render._sample_active)."""
        from echorenderer_tpu.parallel import sample_active_sharded
        from echorenderer_tpu.processes.render import _sample_active_jit

        n = RES[0] * RES[1]
        rs = np.random.RandomState(7)
        ids = jnp.asarray(
            np.sort(rs.choice(n, size=101, replace=False)).astype(np.uint32)
        )
        starts = jnp.asarray(rs.randint(0, 5, size=101).astype(np.uint32))

        a1, q1 = sample_active_sharded(
            make_mesh(1), prepared, ids, starts, RES, seed=0, count=2,
            bounce_limit=4,
        )
        a8, q8 = sample_active_sharded(
            make_mesh(8), prepared, ids, starts, RES, seed=0, count=2,
            bounce_limit=4,
        )
        m = ids.shape[0]
        # padded length differs per shard count; only the valid rows count
        np.testing.assert_array_equal(np.asarray(a1)[:m], np.asarray(a8)[:m])
        np.testing.assert_array_equal(np.asarray(q1)[:m], np.asarray(q8)[:m])

        # the single-device program must use the same lane-aligned width
        # (production buckets are pow2 >= 1024) for bitwise agreement
        pad = 128 - m
        ids_p = jnp.concatenate([ids, jnp.broadcast_to(ids[:1], (pad,))])
        st_p = jnp.concatenate([starts, jnp.broadcast_to(starts[:1], (pad,))])
        s1, sq1 = _sample_active_jit(
            prepared, ids_p, st_p, RES, 0, 2, 4, 2.5
        )
        np.testing.assert_array_equal(np.asarray(a8)[:m], np.asarray(s1)[:m])
        np.testing.assert_array_equal(np.asarray(q8)[:m], np.asarray(sq1)[:m])


class TestMultihost:
    """DCN scaffolding (parallel/multihost.py) in its degenerate 1-process
    CI mode: initialize() must no-op, the global mesh must equal the local
    one, and the multihost frame must be bit-identical to the single-host
    sharded frame (process-count invariance follows from the same
    (seed, pixel, sample, dim) draw hashing that gives chip-count
    invariance)."""

    def test_degenerate_initialize_and_frame(self, prepared):
        from echorenderer_tpu.parallel import multihost
        from echorenderer_tpu.parallel.sharding import render_frame_sharded

        assert multihost.initialize() is False  # no coordinator: no-op
        mesh = multihost.make_global_mesh()
        assert mesh.devices.size == len(jax.devices())
        pidx, pcount, local = multihost.process_shard_info(mesh)
        assert (pidx, pcount) == (0, 1) and local == len(jax.devices())
        img_mh = multihost.render_frame_multihost(
            mesh, prepared, (16, 12), spp=2, seed=3, bounce_limit=3)
        img_sh = render_frame_sharded(
            make_mesh(), prepared, (16, 12), spp=2, seed=3, bounce_limit=3)
        np.testing.assert_array_equal(img_mh, img_sh)
