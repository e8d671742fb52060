"""SNARK backend: Groth16 equality & membership proofs with MiMC-5 commitments.

Mirrors ``/root/reference/src/backend/snark.rs``:

* ``EqualityCircuit`` (snark.rs:255-291): witnesses a, b; enforce ``a == b``;
  in-circuit MiMC-5 of a (3 constraints/round, snark.rs:232-247); public input
  ``[commitment]``.
* ``MembershipCircuit`` (snark.rs:503-585): witness value + one-hot boolean
  selector; public inputs ``[commitment, set[0..64], is_real[0..64]]``
  (129 total, snark.rs:484-494); ``MAX_SET_SIZE = 64``.
* Key-directory config & persistence (snark.rs:20-174): programmatic
  ``set_snark_key_dir`` takes precedence over ``LIBZKP_SNARK_KEY_DIR``;
  rejected after first setup or on conflicting re-set; files
  ``{equality_mimc,membership_mimc}_{pk,vk}.bin`` with load-else-generate-
  then-persist semantics.
* Byte interface ``prove([a:8][b:8][commitment:32])`` (snark.rs:588-611).
"""

from __future__ import annotations

import functools
import os
import threading
from pathlib import Path
from typing import List, Optional, Tuple

from ..ops.field import BN254_FR
from ..ops.mimc import MIMC_ROUNDS, fr_from_commitment, mimc_constants
from ..utils.encoding import read_u64_le
from ..utils.errors import ConfigError
from . import groth16
from .r1cs import ONE, ConstraintSystem

R = BN254_FR.p

MAX_SET_SIZE = 64  # snark.rs:503

# ===== Key directory configuration (snark.rs:20-174) =====

_key_dir_lock = threading.Lock()
_key_dir_override: Optional[Path] = None

_setup_lock = threading.Lock()
_equality_setup: Optional[groth16.ProvingKey] = None
_membership_setup: Optional[groth16.ProvingKey] = None


def _get_key_dir() -> Optional[Path]:
    with _key_dir_lock:
        if _key_dir_override is not None:
            return _key_dir_override
    env = os.environ.get("LIBZKP_SNARK_KEY_DIR")
    return Path(env) if env else None


def set_snark_key_dir(path: str) -> None:
    global _key_dir_override
    if not path:
        raise ConfigError("SNARK key directory cannot be empty")
    if is_snark_initialized():
        raise ConfigError(
            "SNARK setup is already initialized; set LIBZKP_SNARK_KEY_DIR before first proof"
        )
    requested = Path(path)
    with _key_dir_lock:
        if _key_dir_override is not None and _key_dir_override != requested:
            raise ConfigError(
                f"SNARK key directory already set to {_key_dir_override}; "
                f"new value {requested} rejected"
            )
        _key_dir_override = requested


def is_snark_initialized() -> bool:
    return _equality_setup is not None or _membership_setup is not None


def _reset_for_tests() -> None:
    """Drop setup caches and dir override (test-only, like a fresh process)."""
    global _equality_setup, _membership_setup, _key_dir_override
    with _setup_lock:
        _equality_setup = None
        _membership_setup = None
    with _key_dir_lock:
        _key_dir_override = None
    _mimc_wires_cached.cache_clear()


def _load_or_generate(prefix: str, generate) -> groth16.ProvingKey:
    key_dir = _get_key_dir()
    if key_dir is not None:
        pk_path = key_dir / f"{prefix}_pk.bin"
        vk_path = key_dir / f"{prefix}_vk.bin"
        if pk_path.exists() and vk_path.exists():
            pk = groth16.pk_from_bytes(pk_path.read_bytes())
            vk = groth16.vk_from_bytes(vk_path.read_bytes())
            if pk is not None and vk is not None:
                pk.vk = vk
                return pk
            raise ConfigError(f"failed to deserialize SNARK keys in {key_dir}")
        pk = generate()
        try:
            key_dir.mkdir(parents=True, exist_ok=True)
            pk_path.write_bytes(groth16.pk_to_bytes(pk))
            vk_path.write_bytes(groth16.vk_to_bytes(pk.vk))
        except OSError:
            pass  # persistence failures are non-fatal (snark.rs:131-133)
        return pk
    return generate()


# ===== Circuit builders =====


def _mimc_gadget(cs: ConstraintSystem, x_var: int, x_val: int) -> Tuple[object, int]:
    """In-circuit MiMC-5: returns (output LC, output value). 3 constraints/round."""
    constants = mimc_constants()
    cur_lc = cs.lc((1, x_var))
    cur_val = x_val % R
    for c in constants:
        t_lc = dict(cur_lc)
        t_lc[0] = (t_lc.get(0, 0) + c) % R  # t = x + c (linear, 0 constraints)
        t_val = (cur_val + c) % R
        t2_val = t_val * t_val % R
        t2 = cs.new_witness(t2_val)
        cs.enforce(t_lc, t_lc, cs.lc((1, t2)))
        t4_val = t2_val * t2_val % R
        t4 = cs.new_witness(t4_val)
        cs.enforce(cs.lc((1, t2)), cs.lc((1, t2)), cs.lc((1, t4)))
        x5_val = t4_val * t_val % R
        x5 = cs.new_witness(x5_val)
        cs.enforce(cs.lc((1, t4)), t_lc, cs.lc((1, x5)))
        cur_lc = cs.lc((1, x5))
        cur_val = x5_val
    return cur_lc, cur_val


def build_equality_circuit(a: int, b: int, commitment_fr: int) -> ConstraintSystem:
    cs = ConstraintSystem()
    a_var = cs.new_witness(a)
    b_var = cs.new_witness(b)
    cs.enforce_equal(cs.lc((1, a_var)), cs.lc((1, b_var)))
    hash_lc, _ = _mimc_gadget(cs, a_var, a)
    commitment_var = cs.new_input(commitment_fr)
    cs.enforce_equal(hash_lc, cs.lc((1, commitment_var)))
    return cs


def build_membership_circuit(
    value: int,
    sel: List[bool],
    set_values: List[int],
    is_real: List[bool],
    commitment_fr: int,
) -> ConstraintSystem:
    assert len(sel) == len(set_values) == len(is_real) == MAX_SET_SIZE
    cs = ConstraintSystem()
    value_var = cs.new_witness(value)
    hash_lc, _ = _mimc_gadget(cs, value_var, value)
    commitment_var = cs.new_input(commitment_fr)
    cs.enforce_equal(hash_lc, cs.lc((1, commitment_var)))

    set_vars = [cs.new_input(v) for v in set_values]
    is_real_vars = [cs.new_boolean_input(b) for b in is_real]
    sel_vars = [cs.new_boolean_witness(s) for s in sel]

    # one-hot: sum(sel) == 1 and sel[i] <= is_real[i]
    sum_lc = cs.lc(*[(1, sv) for sv in sel_vars])
    cs.enforce_equal(sum_lc, cs.lc((1, ONE)))
    for sv, rv in zip(sel_vars, is_real_vars):
        # sel * (1 - is_real) == 0
        cs.enforce(cs.lc((1, sv)), cs.lc((1, ONE), (R - 1, rv)), {})

    # sum_i sel[i] * (value - set[i]) == 0; set enters via its input
    # *variables* so the QAP structure is independent of the set values
    # (the setup's dummy circuit must share the same QAP).
    acc_terms = []
    for i, sv in enumerate(sel_vars):
        prod_val = (1 if sel[i] else 0) * ((value - set_values[i]) % R) % R
        prod = cs.new_witness(prod_val)
        cs.enforce(
            cs.lc((1, sv)),
            cs.lc((1, value_var), (R - 1, set_vars[i])),
            cs.lc((1, prod)),
        )
        acc_terms.append((1, prod))
    cs.enforce_equal(cs.lc(*acc_terms), {})
    return cs


# ===== Setup caches (OnceLock equivalents, snark.rs:295-341) =====


def _get_equality_setup() -> groth16.ProvingKey:
    global _equality_setup
    with _setup_lock:
        if _equality_setup is None:
            _equality_setup = _load_or_generate(
                "equality_mimc",
                lambda: groth16.setup(build_equality_circuit(0, 0, 0)),
            )
        return _equality_setup


def _get_membership_setup() -> groth16.ProvingKey:
    global _membership_setup
    with _setup_lock:
        if _membership_setup is None:
            dummy = build_membership_circuit(
                0, [False] * MAX_SET_SIZE, [0] * MAX_SET_SIZE,
                [False] * MAX_SET_SIZE, 0,
            )
            _membership_setup = _load_or_generate(
                "membership_mimc", lambda: groth16.setup(dummy)
            )
        return _membership_setup


# ===== Fast witness-only assignment builders =====
#
# The constraint matrices are witness-independent and cached (groth16 CSR
# cache) after the first full prove, so later proves only need the
# assignment vector z. These builders replicate the gadget allocation order
# exactly (differentially tested against ConstraintSystem.full_assignment()).

_circuit_meta: dict = {}  # circuit_key -> (num_instance, n_constraints)


@functools.lru_cache(maxsize=256)
def _mimc_wires_cached(x: int) -> tuple:
    wires: List[int] = []
    cur = x % R
    for c in mimc_constants():
        t = (cur + c) % R
        t2 = t * t % R
        t4 = t2 * t2 % R
        x5 = t4 * t % R
        wires += [t2, t4, x5]
        cur = x5
    return tuple(wires)


def _mimc_wires(x: int) -> List[int]:
    """Witness wires of the MiMC gadget: (t2, t4, x5) per round.

    330 Python field muls per value — memoized so batches full of repeated
    statements (and the witness-memo'd single-prove path) build each
    distinct witness once.

    Retention/timing tradeoff (ADVICE r4): the memo keys on the raw secret
    input, so witness material outlives the prove call and repeat-statement
    proves are observably faster to a timing observer. Same knob as the
    groth16 accumulator memo: set LIBZKP_NO_WITNESS_MEMO=1 to disable both
    when unlinkability against a co-resident timing observer matters more
    than repeat-prove latency.
    """
    if os.environ.get("LIBZKP_NO_WITNESS_MEMO"):
        return list(_mimc_wires_cached.__wrapped__(x))
    return list(_mimc_wires_cached(x))


def _equality_assignment(a: int, b: int, commitment_fr: int) -> List[int]:
    return [1, commitment_fr % R, a % R, b % R] + _mimc_wires(a)


def _membership_assignment(
    value: int, sel, set_values, is_real, commitment_fr: int
) -> List[int]:
    z = [1, commitment_fr % R]
    z += [v % R for v in set_values]
    z += [1 if b else 0 for b in is_real]
    z.append(value % R)
    z += _mimc_wires(value)
    z += [1 if s else 0 for s in sel]
    z += [
        (1 if sel[i] else 0) * ((value - set_values[i]) % R) % R
        for i in range(len(sel))
    ]
    return z


# ===== Backend API (snark.rs:343-495) =====


class SnarkBackend:
    @staticmethod
    def prove_equality_zk(a: int, b: int, hash_input: bytes) -> bytes:
        """Prove MiMC5(a) == commitment AND a == b. Empty bytes on failure."""
        if a != b:
            return b""
        commitment_fr = fr_from_commitment(hash_input)
        if commitment_fr is None:
            return b""
        try:
            pk = _get_equality_setup()
            proof = None
            meta = _circuit_meta.get("equality")
            if meta is not None:
                proof = groth16.prove_assigned(
                    pk, _equality_assignment(a, b, commitment_fr),
                    meta[0], meta[1], "equality",
                )
            if proof is None:
                cs = build_equality_circuit(a, b, commitment_fr)
                proof = groth16.prove(pk, cs, circuit_key="equality")
                _circuit_meta["equality"] = (cs.num_instance, len(cs.constraints))
            return groth16.proof_to_bytes(proof)
        except Exception:
            return b""

    @staticmethod
    def verify_equality_zk(proof_data: bytes, hash_input: bytes) -> bool:
        proof = groth16.proof_from_bytes(proof_data)
        if proof is None:
            return False
        commitment_fr = fr_from_commitment(bytes(hash_input))
        if commitment_fr is None:
            return False
        try:
            pk = _get_equality_setup()
        except Exception:
            return False
        return groth16.verify(pk.vk, [commitment_fr], proof)

    @staticmethod
    def prove_membership_zk(value: int, the_set: List[int], commitment: bytes) -> bytes:
        if not the_set or len(the_set) > MAX_SET_SIZE:
            return b""
        commitment_fr = fr_from_commitment(commitment)
        if commitment_fr is None:
            return b""
        try:
            pos = the_set.index(value)
        except ValueError:
            return b""
        set_values = list(the_set) + [0] * (MAX_SET_SIZE - len(the_set))
        is_real = [True] * len(the_set) + [False] * (MAX_SET_SIZE - len(the_set))
        sel = [False] * MAX_SET_SIZE
        sel[pos] = True
        try:
            pk = _get_membership_setup()
            proof = None
            meta = _circuit_meta.get("membership")
            if meta is not None:
                proof = groth16.prove_assigned(
                    pk,
                    _membership_assignment(value, sel, set_values, is_real, commitment_fr),
                    meta[0], meta[1], "membership",
                )
            if proof is None:
                cs = build_membership_circuit(value, sel, set_values, is_real, commitment_fr)
                proof = groth16.prove(pk, cs, circuit_key="membership")
                _circuit_meta["membership"] = (cs.num_instance, len(cs.constraints))
            return groth16.proof_to_bytes(proof)
        except Exception:
            return b""

    @staticmethod
    def verify_membership_zk(proof_data: bytes, the_set: List[int], commitment: bytes) -> bool:
        if not the_set or len(the_set) > MAX_SET_SIZE:
            return False
        if len(commitment) != 32:
            return False
        proof = groth16.proof_from_bytes(proof_data)
        if proof is None:
            return False
        commitment_fr = fr_from_commitment(bytes(commitment))
        if commitment_fr is None:
            return False
        # public ordering: [commitment, set[0..63], is_real[0..63]] (snark.rs:484-494)
        public = [commitment_fr]
        for i in range(MAX_SET_SIZE):
            public.append(the_set[i] if i < len(the_set) else 0)
        for i in range(MAX_SET_SIZE):
            public.append(1 if i < len(the_set) else 0)
        try:
            pk = _get_membership_setup()
        except Exception:
            return False
        return groth16.verify(pk.vk, public, proof)

    @staticmethod
    def prove_equality_zk_many(
        entries: List[Tuple[int, int, bytes]]
    ) -> Optional[List[bytes]]:
        """Phase-batched equality proving: ``(a, b, commitment)`` entries of
        the one fixed circuit share each proving-key table walk (native
        OMP across the batch). None -> caller falls back to per-proof."""
        meta = _circuit_meta.get("equality")
        if meta is None or not entries:
            return None
        try:
            pk = _get_equality_setup()
        except Exception:
            return None
        z_list = []
        for a, b, commitment in entries:
            if a != b:
                return None
            commitment_fr = fr_from_commitment(commitment)
            if commitment_fr is None:
                return None
            z_list.append(_equality_assignment(a, b, commitment_fr))
        proofs = groth16.prove_assigned_many(pk, z_list, meta[0], meta[1], "equality")
        if proofs is None:
            return None
        return [groth16.proof_to_bytes(p) for p in proofs]

    @staticmethod
    def prove_membership_zk_many(
        entries: List[Tuple[int, List[int], bytes]]
    ) -> Optional[List[bytes]]:
        """Phase-batched membership proving (see prove_equality_zk_many)."""
        meta = _circuit_meta.get("membership")
        if meta is None or not entries:
            return None
        try:
            pk = _get_membership_setup()
        except Exception:
            return None
        z_list = []
        for value, the_set, commitment in entries:
            if not the_set or len(the_set) > MAX_SET_SIZE:
                return None
            commitment_fr = fr_from_commitment(commitment)
            if commitment_fr is None:
                return None
            try:
                pos = the_set.index(value)
            except ValueError:
                return None
            set_values = list(the_set) + [0] * (MAX_SET_SIZE - len(the_set))
            is_real = [True] * len(the_set) + [False] * (MAX_SET_SIZE - len(the_set))
            sel = [False] * MAX_SET_SIZE
            sel[pos] = True
            z_list.append(
                _membership_assignment(value, sel, set_values, is_real, commitment_fr)
            )
        proofs = groth16.prove_assigned_many(
            pk, z_list, meta[0], meta[1], "membership"
        )
        if proofs is None:
            return None
        return [groth16.proof_to_bytes(p) for p in proofs]

    @staticmethod
    def verify_equality_batch(entries: List[Tuple[bytes, bytes]]) -> List[bool]:
        """Batch-verify ``(proof_data, commitment)`` equality entries.

        Same per-entry checks as :meth:`verify_equality_zk`, but the pairing
        equations combine into one multi-Miller loop + final exponentiation
        (:func:`..models.groth16.verify_batch`).
        """
        results = [False] * len(entries)
        try:
            pk = _get_equality_setup()
        except Exception:
            return results
        idx, items = [], []
        for i, (proof_data, commitment) in enumerate(entries):
            proof = groth16.proof_from_bytes(proof_data)
            commitment_fr = fr_from_commitment(bytes(commitment))
            if proof is None or commitment_fr is None:
                continue
            idx.append(i)
            items.append(([commitment_fr], proof))
        for i, ok in zip(idx, groth16.verify_batch(pk.vk, items)):
            results[i] = ok
        return results

    @staticmethod
    def verify_membership_batch(
        entries: List[Tuple[bytes, List[int], bytes]]
    ) -> List[bool]:
        """Batch-verify ``(proof_data, the_set, commitment)`` membership
        entries (checks mirror :meth:`verify_membership_zk`)."""
        results = [False] * len(entries)
        try:
            pk = _get_membership_setup()
        except Exception:
            return results
        idx, items = [], []
        for i, (proof_data, the_set, commitment) in enumerate(entries):
            if not the_set or len(the_set) > MAX_SET_SIZE or len(commitment) != 32:
                continue
            proof = groth16.proof_from_bytes(proof_data)
            commitment_fr = fr_from_commitment(bytes(commitment))
            if proof is None or commitment_fr is None:
                continue
            public = [commitment_fr]
            for j in range(MAX_SET_SIZE):
                public.append(the_set[j] if j < len(the_set) else 0)
            for j in range(MAX_SET_SIZE):
                public.append(1 if j < len(the_set) else 0)
            idx.append(i)
            items.append((public, proof))
        for i, ok in zip(idx, groth16.verify_batch(pk.vk, items)):
            results[i] = ok
        return results

    # -- raw ZkpBackend trait interface (snark.rs:588-616) -----------------
    @staticmethod
    def prove(data: bytes) -> bytes:
        if len(data) != 48:
            return b""
        a = read_u64_le(data, 0)
        b = read_u64_le(data, 8)
        if a is None or b is None:
            return b""
        return SnarkBackend.prove_equality_zk(a, b, data[16:48])

    @staticmethod
    def verify(proof: bytes, data: bytes) -> bool:
        return SnarkBackend.verify_equality_zk(proof, data)
