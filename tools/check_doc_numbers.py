"""Mechanized doc-number truth: every performance figure the docs quote
must agree with BENCH_RESULTS.json within that row's recorded spread.

Round-5 fix for a three-rounds-running failure mode: the benchmark table
was declared the single source of truth, then the newest headline went
into README/STATUS/SERVING without the table being regenerated. This
checker makes the drift mechanical: it extracts each registered claim
from the doc text with a regex, resolves the authoritative value from
BENCH_RESULTS.json (or an explicit pinned artifact), and fails if the
quoted number falls outside value*(1 +- spread + rounding slack) — or
if the claim text disappeared (a silent unregistration is also drift).

Runnable in CI (no TPU needed — it reads the checked-in artifacts):

    python tools/check_doc_numbers.py

Add a claim when a doc quotes a new benchmarked number; the workload
key must match the BENCH_RESULTS row's "workload" field exactly.
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (doc path, regex with ONE capture group around the number, workload key
#  in BENCH_RESULTS.json, scale applied to the captured number before
#  comparison, extra relative slack for display rounding e.g. "10.2M").
CLAIMS = [
    # README headline block
    ("README.md",
     r"tinympc-tpu, fused Pallas kernel:\s*([\d,]+) solves/s",
     "quadrotor_20hz N=20 cold solve (fused, ct=25) HEADLINE", 1, 0.0),
    ("README.md",
     r"tinympc-tpu, XLA path \(1× v5e chip\):\s*([\d,]+) solves/s",
     "quadrotor_20hz N=20 cold solve (XLA)", 1, 0.0),
    ("README.md",
     r"the fused kernel does ([\d.]+)M solves/s vs the oracle's 1,826",
     "__ct1__", 1e6, 0.05),
    ("README.md",
     r"max_iter 500\): ([\d,]+)k solves/s",
     "__toconv__", 1e3, 0.05),
    # STATUS performance section
    ("STATUS.md",
     r"\*\*([\d,]+) solves/s\*\* on the fixed-work headline",
     "quadrotor_20hz N=20 cold solve (fused, ct=25) HEADLINE", 1, 0.0),
    # SERVING decision tree
    ("docs/SERVING.md",
     r"([\d.]+)M MPC steps/s.*ct=5",
     "closed-loop MPC steps (fused kernel, ct=5)", 1e6, 0.05),
    ("docs/SERVING.md",
     r"cold fleet sweeps.*?([\d.]+)M solves/s",
     "quadrotor_20hz N=20 cold solve (fused, ct=25) HEADLINE", 1e6, 0.05),
]

# Synthetic keys resolved from bench.py-style artifacts rather than
# table rows.
SYNTHETIC = {"__ct1__", "__toconv__"}


def load_results():
    with open(os.path.join(ROOT, "BENCH_RESULTS.json")) as fh:
        data = json.load(fh)
    rows = {r["workload"]: r for r in data["rows"]}
    return rows


def resolve(rows, key):
    """-> (value, spread) for a claim key."""
    if key == "__ct1__":
        # The ct=1 strict-parity number lives in the driver-captured
        # bench.py JSON (BENCH_r*.json newest) — fall back to the last
        # recorded value.
        for fn in sorted(os.listdir(ROOT), reverse=True):
            if re.match(r"BENCH_r\d+\.json$", fn):
                with open(os.path.join(ROOT, fn)) as fh:
                    rec = json.load(fh)
                if "ct1_solves_per_s" in rec:
                    return rec["ct1_solves_per_s"], \
                        rec.get("ct1_spread_pct", 5) / 100 + 0.02
        raise KeyError("no BENCH_r*.json with ct1_solves_per_s")
    if key == "__toconv__":
        for fn in sorted(os.listdir(ROOT), reverse=True):
            if re.match(r"BENCH_r\d+\.json$", fn):
                with open(os.path.join(ROOT, fn)) as fh:
                    rec = json.load(fh)
                if "to_convergence_solves_per_s" in rec:
                    return rec["to_convergence_solves_per_s"], \
                        rec.get("to_convergence_spread_pct", 5) / 100 + 0.02
        raise KeyError("no BENCH_r*.json with to_convergence_solves_per_s")
    row = rows[key]
    return row["value"], row.get("spread", 0.0)


def main():
    rows = load_results()
    failures = []
    for path, pat, key, scale, extra in CLAIMS:
        full = os.path.join(ROOT, path)
        text = open(full, encoding="utf-8").read()
        m = re.search(pat, text, re.DOTALL)
        if not m:
            failures.append(f"{path}: claim regex not found: {pat!r}")
            continue
        quoted = float(m.group(1).replace(",", "")) * scale
        try:
            value, spread = resolve(rows, key)
        except KeyError as e:
            failures.append(f"{path}: {e}")
            continue
        tol = abs(value) * (spread + extra + 0.01)
        if abs(quoted - value) > tol:
            failures.append(
                f"{path}: quotes {quoted:,.0f} for {key!r} but "
                f"BENCH records {value:,.0f} (spread {spread:.1%}; "
                f"allowed ±{tol:,.0f})")
    if failures:
        print("DOC NUMBER DRIFT:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print(f"doc numbers OK: {len(CLAIMS)} claims within recorded spread")


if __name__ == "__main__":
    main()
