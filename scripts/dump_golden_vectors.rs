//! Golden-vector dumper for cross-implementation interop testing.
//!
//! Build against the reference crate (Lumina-Group/libzkp v0.2.0) and run to
//! emit JSON files into tests/goldens/; the pytest suite in
//! tests/test_goldens.py then verifies every Rust-generated proof under the
//! TPU rebuild (and docs/INTEROP.md §1 lists the commitment pins that must
//! match bit-for-bit).
//!
//!     cargo new golden_dump && cd golden_dump
//!     # Cargo.toml: libzkp = { path = "/root/reference", default-features = false, features = ["parallel"] }
//!     # copy this file to src/main.rs
//!     cargo run --release -- /path/to/repo/tests/goldens
//!
//! No Rust toolchain ships in the build image, so this script is the recipe,
//! not a CI step. The MiMC pins in tests/test_goldens.py were computed from
//! this framework's implementation of the identical construction
//! (SHA256("libzkp_mimc_v1:"||i_le) mod p, 110 rounds x<-(x+c)^5).

use std::env;
use std::fs;

fn hex(b: &[u8]) -> String {
    b.iter().map(|x| format!("{:02x}", x)).collect()
}

fn write_vec(dir: &str, name: &str, proof_type: &str, proof: &[u8], args: &str) {
    let body = format!(
        "{{\"proof_type\": \"{}\", \"proof_hex\": \"{}\", \"args\": {}}}\n",
        proof_type,
        hex(proof),
        args
    );
    fs::write(format!("{}/{}.json", dir, name), body).unwrap();
}

fn main() {
    let dir = env::args().nth(1).unwrap_or_else(|| "goldens".into());
    fs::create_dir_all(&dir).unwrap();

    // --- commitment pins (must equal tests/test_goldens.py) ----------------
    let c42 = libzkp::utils::commitment::commit_value_snark(42);
    println!("snark_commit_value(42) = {}", hex(&c42));

    // --- one proof per scheme, canonical benchmark workloads ---------------
    let p = libzkp::proof::range_proof::prove_range(50, 0, 100).unwrap();
    write_vec(&dir, "range_50_0_100", "range", &p, "{\"min\": 0, \"max\": 100}");

    let p = libzkp::proof::equality_proof::prove_equality(42, 42).unwrap();
    write_vec(&dir, "equality_42", "equality", &p, "{\"val1\": 42, \"val2\": 42}");

    let p = libzkp::proof::threshold_proof::prove_threshold(&[10, 20, 30, 40], 50).unwrap();
    write_vec(&dir, "threshold_100_50", "threshold", &p, "{\"threshold\": 50}");

    let p = libzkp::proof::set_membership::prove_membership(25, &[10, 20, 25, 30, 40]).unwrap();
    write_vec(
        &dir,
        "membership_25",
        "membership",
        &p,
        "{\"set\": [10, 20, 25, 30, 40]}",
    );

    let p = libzkp::proof::improvement_proof::prove_improvement(30, 50).unwrap();
    write_vec(&dir, "improvement_30_50", "improvement", &p, "{\"old\": 30}");

    let p = libzkp::proof::consistency_proof::prove_consistency(&[10, 20, 30, 40, 50]).unwrap();
    write_vec(&dir, "consistency_inc", "consistency", &p, "{}");

    println!("golden vectors written to {}", dir);
}
