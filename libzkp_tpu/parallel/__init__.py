"""Parallel/distributed layer: device mesh, collectives, sharded provers.

The TPU-native replacement for the reference's rayon thread pool
(SURVEY.md §2.3): batches shard over the ``dp`` mesh axis, intra-proof
primitives (MSM buckets, NTT stages) shard over the ``shard`` axis.
"""
