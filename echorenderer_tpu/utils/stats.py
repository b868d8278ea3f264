"""Named event counters threaded through render kernels.

Replaces the reference's source-generated statistics system
(Common/Compute/Statistics/IStatistics.cs, Echo.Generation/StatisticsGenerator.cs):
there, `stats.Report("Label")` literals are compiled into per-worker packed
counter fields. Here, a static tuple of counter names maps to a single
float32 vector that kernels add into; across a device mesh the vector is
`psum`-reduced. Registration happens at Python import/trace time (the
analogue of Roslyn compile time).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# The counter labels emitted by the path-traced evaluator in the reference
# (grep 'Report("' over Evaluation/Evaluators/*.cs).
PATH_TRACE_COUNTERS = (
    "Bounce/Created",
    "Bounce/Specular",
    "Bounce/Multiple Importance",
    "Light/Evaluated Infinite",
    "Light/Sampled",
    "Light/Occlusion Checked",
    "Light/Occlusion Passed",
    "Sample/Evaluated",
    "Sample/Rejected",
)


class Counters(NamedTuple):
    names: tuple  # static python tuple of labels
    values: jax.Array  # (len(names),) float32

    def report(self, name: str, amount) -> "Counters":
        idx = self.names.index(name)
        return self._replace(
            values=self.values.at[idx].add(jnp.asarray(amount, jnp.float32))
        )

    def __getitem__(self, name: str):
        return self.values[self.names.index(name)]

    def to_dict(self) -> dict:
        vals = jax.device_get(self.values)
        return {n: float(v) for n, v in zip(self.names, vals)}


def zeros(names=PATH_TRACE_COUNTERS) -> Counters:
    return Counters(names=tuple(names), values=jnp.zeros(len(names), jnp.float32))


def merge(a: Counters, b: Counters) -> Counters:
    assert a.names == b.names
    return Counters(names=a.names, values=a.values + b.values)


# Register as a pytree with names as static aux data so Counters can flow
# through jit/scan/psum boundaries.
jax.tree_util.register_pytree_node(
    Counters,
    lambda c: ((c.values,), c.names),
    lambda names, vals: Counters(names=names, values=vals[0]),
)
