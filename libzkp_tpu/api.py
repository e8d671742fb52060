"""Public Python API — the 50-function surface of the reference.

Checklist source: ``/root/reference/src/python_api.rs:110-163``. Functions are
added here as the layers beneath them land; ``__all__`` is the parity list.
"""

from __future__ import annotations

from .utils.commitment import commit_value_snark as _commit_value_snark

__all__ = [
    "snark_commit_value",
]


def snark_commit_value(value: int) -> bytes:
    """MiMC-5 (BN254 Fr) commitment (python_api.rs:33-34)."""
    return _commit_value_snark(value)
