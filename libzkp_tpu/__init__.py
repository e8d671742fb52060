"""libzkp_tpu — a TPU-native zero-knowledge-proof framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Lumina-Group/libzkp`` (Rust): six proof types (range, equality, threshold,
set-membership, improvement, consistency) over three backends (Bulletproofs /
Ristretto255, Groth16 / BN254, STARK / f128), with the identical Python API
surface, proof byte layouts, and 32-byte MiMC commitments.

The public API (this module's top level) mirrors the 50 functions the
reference registers in ``/root/reference/src/python_api.rs:110-163``.
"""

# Persistent XLA compilation cache: TPU compiles (especially over remote
# tunnels) cost minutes; cache executables across processes. Best-effort.
def _enable_compilation_cache() -> None:
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "LIBZKP_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

from .api import *  # noqa: F401,F403
from .api import __all__  # noqa: F401
