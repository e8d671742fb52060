"""Compute kernels: limb field arithmetic, hashes, NTT, MSM, curve ops.

This is L0/L1 of the TPU-first stack (SURVEY.md §7): everything the Rust
reference delegated to external crypto crates, rebuilt as JAX/Pallas kernels
plus exact host-side golden models.
"""
