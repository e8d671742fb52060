"""Sharded parallel verification.

Replaces the reference's rayon parallel verify (performance.rs:246-294). The
host tier fans out across threads; on a mesh, proof batches are bucketed by
scheme and their MSM-heavy checks shard over ``dp`` as the TPU verify kernels
land per scheme.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..utils.performance import verify_proofs_parallel as _host_verify


def verify_proofs_parallel(proofs: Sequence[Tuple[bytes, str]]) -> List[bool]:
    return _host_verify(proofs)
