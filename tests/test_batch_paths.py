"""Batched prove/verify paths: equivalence with the single-proof paths.

The lockstep bulletproofs batch prover, the phase-batched Groth16 prover,
and the RLC batch verifiers must produce/accept exactly what the per-proof
paths do (reference semantics: batch.rs:110-140, performance.rs:246-294).
"""

import libzkp_tpu.api as zkp
from libzkp_tpu.models.schemes.consistency_proof import prove_consistency_batch
from libzkp_tpu.models.schemes.equality_proof import prove_equality_batch
from libzkp_tpu.models.schemes.range_proof import prove_range_batch
from libzkp_tpu.models.schemes.set_membership import prove_membership_batch
from libzkp_tpu.models.schemes.threshold_proof import prove_threshold_batch


def test_range_batch_roundtrip():
    proofs = prove_range_batch([(50, 0, 100), (0, 0, 100), (100, 0, 100), (7, 7, 7)])
    assert zkp.verify_range(proofs[0], 0, 100)
    assert zkp.verify_range(proofs[1], 0, 100)
    assert zkp.verify_range(proofs[2], 0, 100)
    assert zkp.verify_range(proofs[3], 7, 7)
    assert not zkp.verify_range(proofs[0], 0, 99)
    # independently randomized even for identical statements
    pair = prove_range_batch([(5, 0, 10), (5, 0, 10)])
    assert pair[0] != pair[1]


def test_threshold_and_consistency_batch_roundtrip():
    th = prove_threshold_batch([([10, 20, 30, 40], 50), ([100], 100)])
    assert zkp.verify_threshold(th[0], 50)
    assert zkp.verify_threshold(th[1], 100)
    assert not zkp.verify_threshold(th[0], 51)
    cs = prove_consistency_batch([[10, 20, 30, 40, 50], [1, 1, 2]])
    assert zkp.verify_consistency(cs[0])
    assert zkp.verify_consistency(cs[1])
    bad = bytearray(cs[0])
    bad[16] ^= 0xFF
    assert not zkp.verify_consistency(bytes(bad))


def test_groth16_batch_roundtrip_and_dedup_randomization():
    eq = prove_equality_batch([(42, 42), (42, 42), (7, 7)])
    assert zkp.verify_equality(eq[0], 42, 42)
    assert zkp.verify_equality(eq[1], 42, 42)
    assert zkp.verify_equality(eq[2], 7, 7)
    # deduped statements must still yield distinct (freshly blinded) proofs
    assert eq[0] != eq[1]
    mem = prove_membership_batch([(25, [10, 20, 25, 30, 40]), (10, [10, 20])])
    assert zkp.verify_membership(mem[0], [10, 20, 25, 30, 40])
    assert zkp.verify_membership(mem[1], [10, 20])
    assert not zkp.verify_membership(mem[1], [10, 25])


def test_parallel_verify_exact_flags_under_tampering():
    proofs = []
    types = []
    for i in range(3):
        proofs.append(zkp.prove_range(50, 0, 100))
        types.append("range")
        proofs.append(zkp.prove_equality(42, 42))
        types.append("equality")
        proofs.append(zkp.prove_consistency([10, 20, 30, 40]))
        types.append("consistency")
        proofs.append(zkp.prove_improvement(30, 50))
        types.append("improvement")
    pairs = list(zip(proofs, types))
    assert zkp.verify_proofs_parallel(pairs) == [True] * len(pairs)
    # tamper one bulletproofs proof and one groth16 proof; flags must be
    # exact despite the RLC-batched grand checks (bisection)
    bad = list(pairs)
    t0 = bytearray(bad[0][0])
    t0[14] ^= 0x01
    bad[0] = (bytes(t0), bad[0][1])
    t5 = bytearray(bad[5][0])
    t5[-3] ^= 0x80
    bad[5] = (bytes(t5), bad[5][1])
    flags = zkp.verify_proofs_parallel(bad)
    assert flags[0] is False and flags[5] is False
    assert sum(flags) == len(bad) - 2
    # wrong type labels are rejected per proof
    assert zkp.verify_proofs_parallel([(proofs[0], "equality")]) == [False]


def test_mixed_process_batch_uses_batched_paths():
    bid = zkp.create_proof_batch()
    for i in range(3):
        zkp.batch_add_range_proof(bid, 50, 0, 100)
        zkp.batch_add_equality_proof(bid, 40 + i, 40 + i)
        zkp.batch_add_threshold_proof(bid, [10, 20, 30, 40], 50)
        zkp.batch_add_membership_proof(bid, 25, [10, 20, 25, 30, 40])
        zkp.batch_add_improvement_proof(bid, 30, 50 + i)
        zkp.batch_add_consistency_proof(bid, [10, 20, 30, 40, 50])
    proofs = zkp.process_batch(bid)
    assert len(proofs) == 18
    assert zkp.verify_range(proofs[0], 0, 100)
    assert zkp.verify_equality(proofs[1], 40, 40)
    assert zkp.verify_threshold(proofs[2], 50)
    assert zkp.verify_membership(proofs[3], [10, 20, 25, 30, 40])
    assert zkp.verify_improvement(proofs[4], 30)
    assert zkp.verify_consistency(proofs[5])
    assert zkp.verify_equality(proofs[7], 41, 41)


def test_fused_bp_pool_preserves_order_and_tails():
    """The fused range/threshold/consistency pool must return every proof in
    its op slot, including when the instance count leaves a sub-8 tail
    (here: 3 ranges + 2 thresholds + 1 consistency = 6+2+4 = 12 instances +
    odd interleaving with the other schemes)."""
    import libzkp_tpu.api as zkp

    bid = zkp.create_proof_batch()
    zkp.batch_add_range_proof(bid, 5, 0, 10)
    zkp.batch_add_improvement_proof(bid, 1, 9)
    zkp.batch_add_threshold_proof(bid, [4, 5], 8)
    zkp.batch_add_consistency_proof(bid, [1, 2, 3, 4, 5])
    zkp.batch_add_range_proof(bid, 7, 0, 100)
    zkp.batch_add_equality_proof(bid, 6, 6)
    zkp.batch_add_threshold_proof(bid, [10, 20], 15)
    zkp.batch_add_range_proof(bid, 0, 0, 0)
    proofs = zkp.process_batch(bid)
    assert len(proofs) == 8
    assert zkp.verify_range(proofs[0], 0, 10)
    assert zkp.verify_improvement(proofs[1], 1)
    assert zkp.verify_threshold(proofs[2], 8)
    assert zkp.verify_consistency(proofs[3])
    assert zkp.verify_range(proofs[4], 0, 100)
    assert zkp.verify_equality(proofs[5], 6, 6)
    assert zkp.verify_threshold(proofs[6], 15)
    assert zkp.verify_range(proofs[7], 0, 0)
    # cross-scheme mixups must fail
    assert not zkp.verify_range(proofs[2], 0, 10)
    assert not zkp.verify_consistency(proofs[0])
