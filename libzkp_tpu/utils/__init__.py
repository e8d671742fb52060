"""Cross-cutting utilities (errors, limits, envelope, validation, codecs).

Mirrors the reference's ``src/utils/`` layer (SURVEY.md §1); re-exported
wholesale like ``utils/mod.rs:11-19``.
"""

from . import encoding, envelope, errors, limits, serialization, validation  # noqa: F401
from .envelope import PROOF_VERSION, Proof  # noqa: F401
from .errors import (  # noqa: F401
    BackendError,
    ConfigError,
    CryptoError,
    InvalidInput,
    InvalidProofFormat,
    ProofGenerationFailed,
    SerializationError,
    StorageError,
    VerificationFailed,
    ZkpError,
)
