"""libzkp_tpu — a TPU-native zero-knowledge-proof framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Lumina-Group/libzkp`` (Rust): six proof types (range, equality, threshold,
set-membership, improvement, consistency) over three backends (Bulletproofs /
Ristretto255, Groth16 / BN254, STARK / f128), with the identical Python API
surface, proof byte layouts, and 32-byte MiMC commitments.

The public API (this module's top level) mirrors the 50 functions the
reference registers in ``/root/reference/src/python_api.rs:110-163``.
"""

from .api import *  # noqa: F401,F403
from .api import __all__  # noqa: F401
