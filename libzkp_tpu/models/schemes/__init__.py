"""The six proof-type modules (proof layer, scheme ids 1-6).

Mirrors the reference's ``src/proof/`` layer: public prove/verify per type,
input validation, envelope encode/decode.
"""
