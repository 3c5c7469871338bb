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
     r"the schedule-free kernel still does ([\d,]+)",
     "quadrotor_20hz N=20 cold solve (fused, ct=25, no schedule)", 1, 0.0),
    ("README.md",
     r"the fused kernel does ([\d.]+)M solves/s vs the oracle's 1,826",
     "__ct1__", 1e6, 0.05),
    ("README.md",
     r"max_iter 500\): ([\d,]+)k solves/s",
     "__toconv__", 1e3, 0.05),
    ("README.md",
     r"([\d.]+)M solves/s at 16 systems × 2048 problems",
     "hetero fleet 16 systems (bucketed fused)", 1e6, 0.05),
    ("README.md",
     r"([\d.]+)M at its stride sweet spot",
     "closed-loop MPC steps (fused kernel, ct=5)", 1e6, 0.05),
    # STATUS performance section
    ("STATUS.md",
     r"HEADLINE row\): ([\d,]+) quadrotor N=20 solves/s",
     "quadrotor_20hz N=20 cold solve (fused, ct=25) HEADLINE", 1, 0.0),
    ("STATUS.md",
     r"coarse_iters=50 mixed-precision schedule; ([\d,]+)\s*\nschedule-free",
     "quadrotor_20hz N=20 cold solve (fused, ct=25, no schedule)", 1, 0.0),
    # DESIGN numbers table
    ("docs/DESIGN.md",
     r"fused Pallas kernel, 1× v5e \(coarse_iters=50\) \| ([\d.]+)M",
     "quadrotor_20hz N=20 cold solve (fused, ct=25) HEADLINE", 1e6, 0.05),
    ("docs/DESIGN.md",
     r"fused kernel, schedule-free \| ([\d.]+)M",
     "quadrotor_20hz N=20 cold solve (fused, ct=25, no schedule)", 1e6, 0.05),
    # SERVING decision tree
    ("docs/SERVING.md",
     r"headline: ([\d.]+)M quadrotor N=20 solves/s",
     "quadrotor_20hz N=20 cold solve (fused, ct=25) HEADLINE", 1e6, 0.05),
    ("docs/SERVING.md",
     r"([\d.]+)M MPC steps/s at ct=5",
     "closed-loop MPC steps (fused kernel, ct=5)", 1e6, 0.05),
    ("docs/SERVING.md",
     r"([\d.]+)M solves/s = 3.1× the vmap-XLA fallback",
     "hetero fleet 16 systems (bucketed fused)", 1e6, 0.05),
    # PARITY ladder economics
    ("docs/PARITY.md",
     r"equal cost\s*\(([\d]+)k vs [\d]+k solves/s",
     "to-convergence hard batch high-500 + highest-tail-500", 1e3, 0.05),
    ("docs/PARITY.md",
     r"equal cost\s*\([\d]+k vs ([\d]+)k solves/s",
     "to-convergence hard batch high-1000 (budget control)", 1e3, 0.05),
    # Shift warm start (round 5): the +27% and its two endpoints. The
    # percent claims resolve to 100*(shift_row/base_row - 1) via the
    # ratio key form below.
    ("README.md",
     r"measured \+(\d+)% MPC\s*steps/s on transient-heavy",
     ("__ratio_pct__",
      "closed-loop MPC steps (fused, ct=5, mi=500, shift-warm)",
      "closed-loop MPC steps (fused, ct=5, mi=500)"), 1, 0.10),
    ("docs/SERVING.md",
     r"\+(\d+)% at max_iter=500",
     ("__ratio_pct__",
      "closed-loop MPC steps (fused, ct=5, mi=500, shift-warm)",
      "closed-loop MPC steps (fused, ct=5, mi=500)"), 1, 0.10),
    ("docs/SERVING.md",
     r"at max_iter=500 \(([\d.]+)M → [\d.]+M",
     "closed-loop MPC steps (fused, ct=5, mi=500)", 1e6, 0.05),
    ("docs/SERVING.md",
     r"at max_iter=500 \([\d.]+M → ([\d.]+)M",
     "closed-loop MPC steps (fused, ct=5, mi=500, shift-warm)", 1e6, 0.05),
    ("STATUS.md",
     r"max_iter=500 cold fleets: ([\d.]+)M →",
     "closed-loop MPC steps (fused, ct=5, mi=500)", 1e6, 0.05),
    ("STATUS.md",
     r"max_iter=500 cold fleets: [\d.]+M →\s*([\d.]+)M",
     "closed-loop MPC steps (fused, ct=5, mi=500, shift-warm)", 1e6, 0.05),
    # Serving-batch asymptote of the headline (round 5).
    ("docs/SERVING.md",
     r"([\d.]+)M solves/s at B=262144",
     "quadrotor_20hz N=20 cold solve (fused, ct=25, B=262144)", 1e6, 0.05),
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
    """-> (value, spread) for a claim key.

    A tuple key ("__ratio_pct__", numer_workload, denom_workload)
    resolves to the percent speedup 100*(numer/denom - 1) with the two
    rows' spreads summed — for claims like "+27% MPC steps/s" whose
    truth is a ratio of two benchmark rows.
    """
    if isinstance(key, tuple) and key[0] == "__ratio_pct__":
        (va, sa), (vb, sb) = resolve(rows, key[1]), resolve(rows, key[2])
        return 100.0 * (va / vb - 1.0), sa + sb
    if key in SYNTHETIC:
        # The ct=1 / to-convergence rows live in the driver-captured
        # bench.py JSON (BENCH_r*.json, newest first; the record may be
        # wrapped as {"parsed": {...}}).
        field = {"__ct1__": "ct1_solves_per_s",
                 "__toconv__": "to_convergence_solves_per_s"}[key]
        sfield = field.replace("solves_per_s", "spread_pct")
        for fn in sorted(os.listdir(ROOT), reverse=True):
            if re.match(r"BENCH_r\d+\.json$", fn):
                with open(os.path.join(ROOT, fn)) as fh:
                    rec = json.load(fh)
                rec = rec.get("parsed", rec)
                if field in rec:
                    return rec[field], rec.get(sfield, 5) / 100 + 0.02
        raise KeyError(f"no BENCH_r*.json with {field}")
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
