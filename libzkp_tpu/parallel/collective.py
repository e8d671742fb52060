"""Collective layer: named-axis wrappers over the XLA collectives.

SURVEY.md §2.3 "Collective layer" — this is the framework's communication
backend over ICI/DCN, the TPU-native replacement for the distributed layer
the reference does not have (its only parallelism is rayon shared-memory,
``/root/reference/src/advanced/batch.rs:123-131``). Everything here must be
called from inside a ``shard_map``-decorated function running over a mesh
from :mod:`libzkp_tpu.parallel.mesh`.

Kept deliberately thin: the value is the named seam (call sites say *which
logical axis* they reduce over, not how), plus the one non-trivial collective
— :func:`reduce_points` — which folds a non-psum-reducible monoid (elliptic
curve point addition) across an axis via all_gather + local tree.
"""

from __future__ import annotations

from typing import Callable

import jax


def psum(x, axis: str = "dp"):
    """Sum-reduce across a mesh axis (ICI all-reduce)."""
    return jax.lax.psum(x, axis)


def all_gather(x, axis: str = "shard", *, gather_axis: int = 0, tiled: bool = False):
    """Gather shards across a mesh axis into every participant."""
    return jax.lax.all_gather(x, axis, axis=gather_axis, tiled=tiled)


def all_to_all(x, axis: str, split_axis: int, concat_axis: int, *, tiled: bool = True):
    """Transpose a dimension across a mesh axis (NTT butterfly exchanges).

    ``tiled=True`` (the default) is the block-transpose form: ``split_axis``
    is divided into axis-size blocks that land concatenated on
    ``concat_axis`` — the four-step NTT's inter-chip exchange.
    """
    return jax.lax.all_to_all(x, axis, split_axis, concat_axis, tiled=tiled)


def ppermute(x, axis: str, perm):
    """Point-to-point ring/permutation exchange across a mesh axis."""
    return jax.lax.ppermute(x, axis, perm)


def axis_index(axis: str):
    return jax.lax.axis_index(axis)


def axis_size(axis: str):
    return jax.lax.axis_size(axis)


def reduce_points(add_fn: Callable, x, axis: str = "shard"):
    """Fold partial curve-point sums across a mesh axis.

    Point addition is a monoid but not an XLA reduction op, so the partial
    sums are all-gathered (leading axis = participants) and tree-folded
    locally with ``add_fn`` — every chip computes the same total, which the
    caller's ``out_specs`` then de-duplicates. ``x`` is one partial sum of
    shape ``(C, n, B)``; returns the same shape.
    """
    import jax.numpy as jnp

    parts = jax.lax.all_gather(x, axis, axis=0)  # (axis_size, C, n, B)
    k = parts.shape[0]
    while k > 1:
        half = k // 2
        s = add_fn(parts[:half], parts[half : 2 * half])
        if k % 2:
            s = jnp.concatenate([s, parts[-1:]], axis=0)
        parts = s
        k = (k + 1) // 2
    return parts[0]
