#!/usr/bin/env python
"""Normalized plan-identity diff (the §12 equality gate #3): compare two
.explain("formatted") dumps after normalizing expression ids (#123),
lambda fresh-variable names (lambda x_45 / x_45), plan ids and codegen
stage ids — the identifiers that differ between two builds of the SAME
tree. Exit 0 iff the normalized plans are identical.

Usage: python plans/r12/normalize_diff.py <before.txt> <after.txt>
Ad-hoc measurement tool — not part of the round gates; delete-safe.
"""

from __future__ import annotations

import re
import sys


def normalize(text: str) -> str:
    text = re.sub(r"#\d+L?", "#N", text)
    # Lambda variable NAMES are spelling, not structure: the SQL parser
    # keeps source names (x, acc, t, m — and the SAME name may rebind in
    # nested scopes) while the Column API mints fresh numbered names
    # (x_45). Scope-aware positional renaming would need a real parser,
    # so collapse every lambda-bound name to one token. CAVEAT: this
    # also erases which bound variable an occurrence refers to, so a
    # tree that swapped two bound variables inside one lambda body would
    # falsely compare identical — acceptable for this evidence tool
    # because every conversion is ALSO gated by bitwise result pins and
    # the 239/239 oracle preflight; the committed dumps keep the raw
    # names for manual review.
    text = re.sub(r"\blambda \w+#", "lambda v#", text)
    text = re.sub(r"\bx_\d+\b", "x_K", text)
    # per-process RDD lineage ids in ExistingRDD arguments
    text = re.sub(r"RDD\[\d+\]", "RDD[N]", text)
    text = re.sub(r"plan_id=\d+", "plan_id=N", text)
    text = re.sub(r"\[codegen id : \d+\]", "[codegen id : N]", text)
    text = re.sub(r"\(\d+\)", "(N)", text)  # operator ordinals
    text = re.sub(r"Subquery:? \d+", "Subquery N", text)
    text = re.sub(r"cachedrdd-\d+", "cachedrdd-N", text)
    # ExistingRDD/LogicalRDD RDD ids differ per process
    text = re.sub(r"ExistingRDD\[", "ExistingRDD[", text)
    return text


def main() -> int:
    a, b = sys.argv[1], sys.argv[2]
    na = normalize(open(a).read())
    nb = normalize(open(b).read())
    if na == nb:
        print(f"IDENTICAL (normalized): {a} == {b}")
        return 0
    import difflib

    diff = list(
        difflib.unified_diff(
            na.splitlines(), nb.splitlines(), lineterm="", n=1
        )
    )
    print(f"DIFFER: {a} vs {b} ({len(diff)} diff lines)")
    for line in diff[:80]:
        print(line)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
