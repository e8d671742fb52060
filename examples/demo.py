"""End-to-end walkthrough of every feature (mirrors the reference's
``examples/demo.rs`` acceptance script)."""

import tempfile

import libzkp_tpu as zkp


def main() -> None:
    # --- six proof types ---------------------------------------------------
    p_range = zkp.prove_range(10, 0, 20)
    assert zkp.verify_range(p_range, 0, 20)
    print(f"range proof: {len(p_range)} bytes, verified")

    p_eq = zkp.prove_equality(5, 5)
    assert zkp.verify_equality(p_eq, 5, 5)
    assert zkp.verify_equality_with_commitment(p_eq, zkp.snark_commit_value(5))
    print(f"equality proof: {len(p_eq)} bytes, verified (incl. commitment check)")

    p_thr = zkp.prove_threshold([10, 20, 30, 40], 50)
    assert zkp.verify_threshold(p_thr, 50)
    print(f"threshold proof: {len(p_thr)} bytes, verified")

    p_mem = zkp.prove_membership(25, [10, 20, 25, 30, 40])
    assert zkp.verify_membership(p_mem, [10, 20, 25, 30, 40])
    print(f"membership proof: {len(p_mem)} bytes, verified")

    p_imp = zkp.prove_improvement(30, 50)
    assert zkp.verify_improvement(p_imp, 30)
    print(f"improvement proof: {len(p_imp)} bytes, verified")

    p_con = zkp.prove_consistency([10, 20, 30, 40, 50])
    assert zkp.verify_consistency(p_con)
    print(f"consistency proof: {len(p_con)} bytes, verified")

    # --- composite + metadata ----------------------------------------------
    comp = zkp.create_composite_proof([p_range, p_eq, p_imp])
    assert zkp.verify_composite_proof_integrity_only(comp)
    assert zkp.verify_composite_proof(comp)
    with_md = zkp.create_proof_with_metadata(p_range, {"issuer": b"demo"})
    assert zkp.extract_proof_metadata(with_md)["issuer"] == b"demo"
    print(f"composite proof: {len(comp)} bytes, verified (full + integrity)")

    # --- cache / metrics / parallel verify ---------------------------------
    zkp.prove_range_cached(7, 0, 100)
    zkp.prove_range_cached(7, 0, 100)  # hit
    metrics = zkp.get_performance_metrics()
    print(f"cache hit rate: {metrics['cache_hit_rate']:.2f}")
    results = zkp.verify_proofs_parallel(
        [(p_range, "range"), (p_thr, "threshold"), (p_con, "consistency")]
    )
    assert results == [True, True, True]
    print("parallel verification: all true")

    # --- batch + persistence -----------------------------------------------
    with tempfile.TemporaryDirectory() as d:
        zkp.set_batch_store_dir(d)
        bid = zkp.create_proof_batch()
        zkp.batch_add_range_proof(bid, 10, 0, 20)
        zkp.batch_add_improvement_proof(bid, 1, 5)
        print(f"batch status: {zkp.get_batch_status(bid)}")
        assert bid in zkp.list_batch_ids_in_store()
        proofs = zkp.process_batch(bid)
        assert len(proofs) == 2
        print("batch processed, store file consumed")

    # --- benchmark harness --------------------------------------------------
    bench = zkp.benchmark_proof_generation_numeric("improvement", 3)
    print(f"improvement: {bench['proofs_per_second']:.1f} proofs/s")
    print("demo: all features OK")


if __name__ == "__main__":
    main()
