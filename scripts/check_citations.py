#!/usr/bin/env python
"""Verify every ``*.rs:line`` citation in the repo against the reference tree.

A citation like ``bulletproofs.rs:137-158`` or
``/root/reference/src/backend/stark.rs:94-102`` is resolved to the matching
file(s) under ``/root/reference`` and fails if the cited line range exceeds
the file's length.  Guards against the phantom-citation failure mode where
line numbers from some other source (e.g. a vendored crate) are pasted under
a reference path.

Exit status 0 = all citations plausible; 1 = violations (listed on stdout).
Run as part of CI / the test suite (tests/test_utils.py wraps it).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# file extensions we scan for citations
_SCAN_EXT = {".py", ".md", ".cpp", ".rs", ".txt"}
_SKIP_DIRS = {".git", "__pycache__", ".cache", "node_modules"}
# our own helper script quotes phantom examples; don't scan ourselves
_SKIP_FILES = {os.path.abspath(__file__)}

_CITE = re.compile(r"([A-Za-z0-9_./-]*?([A-Za-z0-9_]+\.rs)):(\d+)(?:-(\d+))?")


def _reference_line_counts() -> dict:
    counts: dict = {}
    for root, dirs, files in os.walk(REFERENCE):
        dirs[:] = [d for d in dirs if d not in _SKIP_DIRS]
        for f in files:
            if f.endswith(".rs"):
                path = os.path.join(root, f)
                try:
                    with open(path, "rb") as fh:
                        n = sum(1 for _ in fh)
                except OSError:
                    continue
                counts.setdefault(f, []).append((path, n))
    return counts


def check() -> list:
    counts = _reference_line_counts()
    violations = []
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [d for d in dirs if d not in _SKIP_DIRS]
        for f in files:
            if os.path.splitext(f)[1] not in _SCAN_EXT:
                continue
            path = os.path.join(root, f)
            if os.path.abspath(path) in _SKIP_FILES:
                continue
            try:
                text = open(path, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            for lineno, line in enumerate(text.splitlines(), 1):
                for m in _CITE.finditer(line):
                    full, base, lo, hi = m.group(1), m.group(2), m.group(3), m.group(4)
                    end = int(hi or lo)
                    cands = counts.get(base)
                    if cands is None:
                        continue  # names a crate file not in the reference
                    # a full path must match exactly; a bare basename passes
                    # if ANY same-named reference file is long enough
                    if full.startswith("/root/reference"):
                        cands = [(p, n) for p, n in cands if p == full]
                        if not cands:
                            violations.append(
                                f"{path}:{lineno}: cites missing file {full}"
                            )
                            continue
                    if not any(end <= n for _, n in cands):
                        lens = ", ".join(f"{p} has {n} lines" for p, n in cands)
                        violations.append(
                            f"{path}:{lineno}: cites {m.group(0)} but {lens}"
                        )
    return violations


def main() -> int:
    violations = check()
    for v in violations:
        print(v)
    print(f"checked reference citations: {len(violations)} violation(s)")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
