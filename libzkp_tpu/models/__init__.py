"""Proof systems (backends) and proof schemes.

L2/L3 of the stack (SURVEY.md §7): Bulletproofs (Ristretto255), Groth16
(BN254), and STARK (f128) backends, plus the six proof-type modules above
them. Mirrors the reference's ``src/backend/`` + ``src/proof/`` layers.
"""
