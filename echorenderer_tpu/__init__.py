"""echorenderer_tpu — a TPU-native physically-based rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Echo
(GaryHuan9/EchoRenderer, studied read-only at /root/reference): a
unidirectional path tracer with next-event estimation and multiple
importance sampling, physically based materials, a SAH BVH, many-light
importance sampling, adaptive sampling, AOV layers, a compositing stack,
the `.echo` scene description language, and OBJ/PLY import.

Architecture (TPU-first, not a port):
  - Scenes compile to flat SoA device arrays (triangles, BVH nodes,
    material parameter blocks, light records, texture atlases).
  - Rendering is a lockstep wavefront: all pixel lanes advance through
    the bounce loop together under active masks, with deterministic
    counter-based RNG replacing the reference's stateful per-worker
    PRNG clones (Common/Mathematics/Randomization/Prng.cs).
  - Multi-chip scaling is SPMD over a `jax.sharding.Mesh`: pixels are
    data-parallel shards, the scene is replicated, statistics are
    `psum`-reduced.
"""

__version__ = "0.1.0"

# Host-allocator warmup: this VM faults private-anon pages at ~40-60
# MB/s, so scene prep is page-fault bound without it. Start the arena
# pre-touch now, in a daemon thread, so it overlaps jax import/backend
# init instead of the first prepare_scene (utils/hostmem.py for the
# full story). ECHO_HOST_ARENA_MB=0 disables the touch.
from .utils.hostmem import warm_host_allocator_async as _warm

_warm()
del _warm
