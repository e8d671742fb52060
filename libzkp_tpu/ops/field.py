"""Host-side prime-field arithmetic (Python big-int based).

This is the *reference/control-path* tier: exact modular arithmetic used for
single-proof latency paths, transcript logic, and as the golden model for the
TPU limb kernels in :mod:`libzkp_tpu.ops.limb`. Batched/hot paths run on TPU.

Field instances cover everything the Rust reference consumes from external
crates (SURVEY.md §2.2):

* ``BN254_FR`` / ``BN254_FQ``  — arkworks ``ark-bn254`` (snark.rs)
* ``ED25519_FP`` / ``RISTRETTO_L`` — curve25519-dalek (bulletproofs.rs)
* ``F128`` — winterfell ``math::fields::f128`` (stark.rs)
"""

from __future__ import annotations


class PrimeField:
    """Arithmetic mod a prime ``p`` on plain Python ints.

    Elements are canonical ints in ``[0, p)``. Operations are free functions on
    ints for speed (no element-object overhead on hot host paths).
    """

    __slots__ = ("p", "name", "nbytes", "nbits", "_sqrt_exp", "two_adicity", "_nonresidue")

    def __init__(self, p: int, name: str):
        self.p = p
        self.name = name
        self.nbits = p.bit_length()
        self.nbytes = (self.nbits + 7) // 8
        # Precompute two-adicity: p - 1 = 2^s * t
        t = p - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.two_adicity = s
        self._sqrt_exp = (p + 1) // 4 if p % 4 == 3 else None
        self._nonresidue = None

    # -- basic ops ---------------------------------------------------------
    def add(self, a: int, b: int) -> int:
        c = a + b
        return c - self.p if c >= self.p else c

    def sub(self, a: int, b: int) -> int:
        c = a - b
        return c + self.p if c < 0 else c

    def neg(self, a: int) -> int:
        return (self.p - a) if a else 0

    def mul(self, a: int, b: int) -> int:
        return a * b % self.p

    def square(self, a: int) -> int:
        return a * a % self.p

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def inv(self, a: int) -> int:
        if a == 0:
            raise ZeroDivisionError(f"inverse of 0 in {self.name}")
        return pow(a, -1, self.p)

    def div(self, a: int, b: int) -> int:
        return a * self.inv(b) % self.p

    def batch_inv(self, xs: list) -> list:
        """Montgomery batch inversion: one inversion for n elements."""
        n = len(xs)
        if n == 0:
            return []
        prefix = [1] * (n + 1)
        for i, x in enumerate(xs):
            if x == 0:
                raise ZeroDivisionError(f"inverse of 0 in {self.name}")
            prefix[i + 1] = prefix[i] * x % self.p
        inv_all = self.inv(prefix[n])
        out = [0] * n
        for i in range(n - 1, -1, -1):
            out[i] = prefix[i] * inv_all % self.p
            inv_all = inv_all * xs[i] % self.p
        return out

    # -- square roots ------------------------------------------------------
    def legendre(self, a: int) -> int:
        if a == 0:
            return 0
        return 1 if pow(a, (self.p - 1) // 2, self.p) == 1 else -1

    def sqrt(self, a: int):
        """Square root or ``None`` if ``a`` is a non-residue."""
        p = self.p
        if a == 0:
            return 0
        if self._sqrt_exp is not None:  # p % 4 == 3
            r = pow(a, self._sqrt_exp, p)
            return r if r * r % p == a else None
        if p % 8 == 5:  # e.g. 2^255 - 19
            r = pow(a, (p + 3) // 8, p)
            if r * r % p == a:
                return r
            r = r * pow(2, (p - 1) // 4, p) % p
            return r if r * r % p == a else None
        return self._tonelli_shanks(a)

    def _tonelli_shanks(self, a: int):
        p = self.p
        if self.legendre(a) != 1:
            return None
        if self._nonresidue is None:
            z = 2
            while self.legendre(z) != -1:
                z += 1
            self._nonresidue = z
        q = p - 1
        s = 0
        while q % 2 == 0:
            q //= 2
            s += 1
        m = s
        c = pow(self._nonresidue, q, p)
        t = pow(a, q, p)
        r = pow(a, (q + 1) // 2, p)
        while t != 1:
            t2 = t
            i = 0
            while t2 != 1:
                t2 = t2 * t2 % p
                i += 1
                if i == m:
                    return None
            b = pow(c, 1 << (m - i - 1), p)
            m = i
            c = b * b % p
            t = t * c % p
            r = r * b % p
        return r

    # -- serialization -----------------------------------------------------
    def to_le_bytes(self, a: int, length: int | None = None) -> bytes:
        return int(a).to_bytes(length or self.nbytes, "little")

    def from_le_bytes_mod(self, data: bytes) -> int:
        """LE bytes reduced mod p (arkworks ``from_le_bytes_mod_order``)."""
        return int.from_bytes(data, "little") % self.p

    def from_le_bytes_canonical(self, data: bytes):
        """LE bytes, rejecting non-canonical values (``None`` if >= p)."""
        v = int.from_bytes(data, "little")
        return v if v < self.p else None

    # -- roots of unity ----------------------------------------------------
    def root_of_unity(self, order: int) -> int:
        """Primitive ``order``-th root of unity (order must be a power of two)."""
        assert order & (order - 1) == 0, "order must be a power of two"
        assert order <= (1 << self.two_adicity), "field lacks required two-adicity"
        g = self._generator()
        return pow(g, (self.p - 1) // order, self.p)

    def _generator(self) -> int:
        """Smallest multiplicative generator; known values are pinned so the
        two-adic roots match the upstream ecosystems exactly (e.g. f128 g=3
        reproduces winterfell's TWO_ADIC_ROOT_OF_UNITY, verified in tests)."""
        g = _KNOWN_GENERATORS.get(self.p)
        if g is None:
            raise ValueError(f"no known generator for field {self.name}")
        return g


# Verified smallest generators (sympy factorization of p-1):
#   bn254_fr g=5 (matches ark-bn254 Fr GENERATOR), bn254_fq g=3,
#   ed25519_fp g=2, f128 g=3 (matches winterfell f128 GENERATOR).
_KNOWN_GENERATORS = {
    21888242871839275222246405745257275088548364400416034343698204186575808495617: 5,
    21888242871839275222246405745257275088696311157297823662689037894645226208583: 3,
    (1 << 255) - 19: 2,
    (1 << 128) - 45 * (1 << 40) + 1: 3,
}


# ---------------------------------------------------------------------------
# Field instances
# ---------------------------------------------------------------------------

# BN254 (alt_bn128) — ark-bn254 (reference snark.rs:4)
BN254_FQ = PrimeField(
    21888242871839275222246405745257275088696311157297823662689037894645226208583,
    "bn254_fq",
)
BN254_FR = PrimeField(
    21888242871839275222246405745257275088548364400416034343698204186575808495617,
    "bn254_fr",
)

# Curve25519 / Ristretto255 — curve25519-dalek (reference bulletproofs.rs:4-5)
ED25519_FP = PrimeField((1 << 255) - 19, "ed25519_fp")
RISTRETTO_L = PrimeField(
    (1 << 252) + 27742317777372353535851937790883648493, "ristretto_l"
)

# Winterfell f128 — 2^128 - 45 * 2^40 + 1 (reference stark.rs, winterfell 0.10)
F128_MODULUS = (1 << 128) - 45 * (1 << 40) + 1
F128 = PrimeField(F128_MODULUS, "f128")
# winterfell f128: 2-adicity is 40, generator g=3, TWO_ADIC_ROOT = 23953097886125630542083529559205016746
F128_TWO_ADIC_ROOT = 23953097886125630542083529559205016746
