"""The opt-in table-of-multiples MSM tier must be bit-exact with the default
bucket tier.

LIBZKP_TABM_C engages per-process at first use (the built table is cached
behind a ready flag), so the variant runs in a subprocess with the SAME
injected randomness; proof bytes must match byte-for-byte — pinning
msm_tab1/msm_tab8 and the padded-tail grouping against the default path.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
from libzkp_tpu.models.bulletproofs import prove_single_batch, Transcript

n = 64
m = 36  # 4 lockstep groups + a 4-instance padded tail
per = (2 * n + 4) * 64
rand = bytes((i * 131 + 7) % 256 for i in range(per * m))
insts = [
    (Transcript(b"libzkp_range_min"), (37 + i) % (1 << n), 1000 + i, n)
    for i in range(m)
]
from libzkp_tpu.models.bulletproofs import _prove_batch_fixed_n

out = _prove_batch_fixed_n(insts, n, rand)
blob = b"".join(p.to_bytes() + v for p, v in out)
sys.stdout.buffer.write(blob)
"""


def _run(env_extra):
    env = {**os.environ, "PYTHONPATH": REPO, **env_extra}
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, env=env,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()[-800:]
    return r.stdout


def test_tabm_tier_bit_exact_with_default():
    base = _run({"LIBZKP_TABM_C": "0"})
    tabm = _run({"LIBZKP_TABM_C": "12"})
    assert len(base) > 0
    assert base == tabm


def test_scalar_tier_bit_exact_with_ifma():
    base = _run({"LIBZKP_TABM_C": "0"})
    scalar = _run({"LIBZKP_TABM_C": "0", "LIBZKP_NO_IFMA": "1"})
    assert base == scalar
