"""Decompose the to-convergence solved-fraction gap vs the oracle.

Round-4 driver capture: chip (f32, "high", fused, max_iter=500, ct=25)
solved 0.1962 of the benchmark batch vs the oracle's 0.208 — with
DIFFERENT x0 draws (numpy default_rng(0) vs std::mt19937(0)) and
different precision (f32/bf16x3 vs f64). This tool separates the two
causes by feeding the oracle the chip's *exact* x0 batch
(oracle_bench's 5th arg, round 5) and measuring the chip at each
precision rung on that same batch.

Attribution table printed:
  A. oracle, own mt19937 draw  (the BASELINE.md number)
  B. oracle, chip's exact x0s  -> (A - B) = RNG-draw variance
  C. chip "high"   (bf16x3)    -> (B - C) = total precision cost, of which
  D. chip "highest" (f32 multi-pass) -> (B - D) = f32-vs-f64 floor and
                                  (D - C) = the bf16x3 scheme's share
  E. XLA path, CPU float64, same x0s -> cross-check: E should ~= B
     (same arithmetic class as the oracle; run with --cpu-f64)

Stages needing the TPU run only with --chip (one TPU job at a time on
the tunneled chip); --oracle runs the C++ side; --cpu-f64 the float64
XLA cross-check (slow: a full 500-iteration batch on CPU).

Usage:
  python tools/solved_frac_decompose.py --dump --oracle   # CPU half
  python tools/solved_frac_decompose.py --chip            # TPU half
Results land in /tmp/solved_frac_decompose/*.json; --report merges.
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

WORK = "/tmp/solved_frac_decompose"
B = int(os.environ.get("BENCH_B", 32768))
MAX_ITER, CT = 500, 25
ORACLE = os.environ.get("ORACLE_BENCH", "/tmp/oracle5/oracle_bench")


def chip_x0s():
    """bench.py's exact batch, rounded to the f32 values the chip saw."""
    rng = np.random.default_rng(0)
    return rng.uniform(-0.5, 0.5, (B, 12)).astype(np.float32)


def dump():
    os.makedirs(WORK, exist_ok=True)
    path = os.path.join(WORK, "x0s.txt")
    # %.9g round-trips float32 exactly.
    np.savetxt(path, chip_x0s(), fmt="%.9g")
    print("wrote", path)
    return path


def run_oracle(extra, tag):
    cmd = [ORACLE, str(B), str(MAX_ITER), "0", str(CT)] + extra
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    rec = json.loads(out.stderr.strip().splitlines()[-1])
    rec["tag"] = tag
    with open(os.path.join(WORK, f"{tag}.json"), "w") as fh:
        json.dump(rec, fh)
    print(tag, "solved_frac", rec["solved_frac"], "avg_iters",
          rec["avg_iters"])
    return rec


def stage_oracle():
    path = os.path.join(WORK, "x0s.txt")
    run_oracle([], "oracle_own_rng")
    run_oracle([path], "oracle_chip_x0s")


def stage_chip():
    import jax
    import jax.numpy as jnp
    sys.argv = sys.argv[:1]
    import bench
    os.makedirs(WORK, exist_ok=True)
    x0s = jnp.asarray(chip_x0s())
    for prec in ("high", "highest"):
        os.environ["BENCH_PRECISION"] = prec
        step = bench.build(B, jnp.float32, max_iter=MAX_ITER,
                           check_termination=CT)
        _, iters, solved = jax.block_until_ready(step(x0s))
        rec = {"tag": f"chip_{prec}",
               "solved_frac": float(np.mean(np.asarray(solved))),
               "avg_iters": float(np.mean(np.asarray(iters)))}
        with open(os.path.join(WORK, f"chip_{prec}.json"), "w") as fh:
            json.dump(rec, fh)
        print(rec["tag"], "solved_frac", rec["solved_frac"], "avg_iters",
              rec["avg_iters"])


def stage_cpu_f64():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import tinympc_tpu as tm
    from tinympc_tpu import systems
    s = systems.quadrotor_20hz()
    prob = tm.setup(s["A"], s["B"], s["Qdiag"], s["Rdiag"], rho=s["rho"],
                    N=20, dtype=jnp.float64)
    prob = tm.with_bounds(prob, x_min=-5.0, x_max=5.0, u_min=-0.5,
                          u_max=0.5)
    prob = tm.with_settings(prob, max_iter=MAX_ITER, check_termination=CT,
                            matmul_precision="highest")
    Xref = jnp.tile(jnp.asarray([0, 0, 1.0] + [0.0] * 9, jnp.float64),
                    (20, 1))
    x0s = jnp.asarray(chip_x0s(), jnp.float64)
    os.makedirs(WORK, exist_ok=True)
    sols, its = [], []
    step = jax.jit(lambda x: tm.solve_(
        prob, tm.init_state(prob, (x.shape[0],)), Xref, None, x)[0])
    chunk = 4096
    for o in range(0, B, chunk):
        sol = step(x0s[o:o + chunk])
        sols.append(np.asarray(sol.solved))
        its.append(np.asarray(sol.iter))
        print(f"  f64 {o + chunk}/{B}", flush=True)
    rec = {"tag": "cpu_f64_xla",
           "solved_frac": float(np.mean(np.concatenate(sols))),
           "avg_iters": float(np.mean(np.concatenate(its)))}
    with open(os.path.join(WORK, "cpu_f64_xla.json"), "w") as fh:
        json.dump(rec, fh)
    print(rec)


def report():
    recs = {}
    for fn in os.listdir(WORK):
        if fn.endswith(".json"):
            with open(os.path.join(WORK, fn)) as fh:
                r = json.load(fh)
            recs[r["tag"]] = r
    print(json.dumps(recs, indent=1))
    a = recs.get("oracle_own_rng", {}).get("solved_frac")
    b = recs.get("oracle_chip_x0s", {}).get("solved_frac")
    c = recs.get("chip_high", {}).get("solved_frac")
    d = recs.get("chip_highest", {}).get("solved_frac")
    if None not in (a, b, c):
        print(f"\nRNG-draw variance  (A-B): {a - b:+.4f}")
        print(f"precision total    (B-C): {b - c:+.4f}")
    if None not in (b, c, d):
        print(f"  f32-vs-f64 floor (B-D): {b - d:+.4f}")
        print(f"  bf16x3 share     (D-C): {d - c:+.4f}")
    e = recs.get("cpu_f64_xla", {}).get("solved_frac")
    if e is not None and b is not None:
        print(f"f64-XLA cross-check (E vs B): {e:.4f} vs {b:.4f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", action="store_true")
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--cpu-f64", action="store_true")
    ap.add_argument("--report", action="store_true")
    args = ap.parse_args()
    if args.dump:
        dump()
    if args.oracle:
        stage_oracle()
    if args.chip:
        stage_chip()
    if args.cpu_f64:
        stage_cpu_f64()
    if args.report:
        report()
