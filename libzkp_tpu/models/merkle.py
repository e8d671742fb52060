"""BLAKE3 Merkle tree vector commitment (host tier).

The STARK backend's vector commitment, mirroring the role of winterfell's
``MerkleTree<Blake3_256>`` (``/root/reference/src/backend/stark.rs:817``).
Batched tree construction for TPU-side proving lives with the batch prover.
"""

from __future__ import annotations

from typing import List, Sequence

from ..ops.blake3 import blake3_256, merge_digests


class MerkleTree:
    """Binary Merkle tree over 32-byte leaf digests (power-of-two count)."""

    def __init__(self, leaves: Sequence[bytes]):
        n = len(leaves)
        assert n > 0 and n & (n - 1) == 0, "leaf count must be a power of two"
        self.leaves = [bytes(l) for l in leaves]
        self.levels: List[List[bytes]] = [self.leaves]
        cur = self.leaves
        while len(cur) > 1:
            cur = [merge_digests(cur[i], cur[i + 1]) for i in range(0, len(cur), 2)]
            self.levels.append(cur)

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    @property
    def depth(self) -> int:
        return len(self.levels) - 1

    def open(self, index: int) -> List[bytes]:
        """Sibling path from leaf to root."""
        path = []
        for level in self.levels[:-1]:
            sib = index ^ 1
            path.append(level[sib])
            index >>= 1
        return path

    @staticmethod
    def verify(root: bytes, index: int, leaf: bytes, path: List[bytes]) -> bool:
        node = bytes(leaf)
        for sib in path:
            if index & 1:
                node = merge_digests(sib, node)
            else:
                node = merge_digests(node, sib)
            index >>= 1
        return node == root


def hash_elements(F, elements: Sequence[int]) -> bytes:
    """Digest of field elements: BLAKE3 over their LE byte concatenation.

    Mirrors winterfell ``ElementHasher::hash_elements`` semantics (elements
    serialized little-endian, fixed width).
    """
    data = b"".join(int(e).to_bytes(F.nbytes, "little") for e in elements)
    return blake3_256(data)
