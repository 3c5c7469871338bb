#!/usr/bin/env python
"""Altitude + thrust hyperplane constraints (reference examples/quadrotor_linear_constraints.cpp)."""
import sys

import numpy as np

import scenarios

FULLSTEPS = 40


def main():
    # Per-solve dispatch latency dominates on remote/tunneled accelerators;
    # keep demo runs short there (pass an explicit step count to override).
    import jax
    default = FULLSTEPS if jax.default_backend() == "cpu" else 20
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else default
    rec = scenarios.run_quadrotor_linear(steps)
    errs = [float(np.linalg.norm(x)) for x in np.asarray(rec["x0"])[:, :3]]
    total_iters = int(np.sum(rec["iter"]))
    for k in range(0, len(rec["iter"]), max(1, len(rec["iter"]) // 20)):
        print(f"step {k:3d}: iters={rec['iter'][k]:3d} solved={rec['solved'][k]} "
              f"x0[:3]={np.round(np.asarray(rec['x0'][k])[:3], 4)}")
    print(f"\ntotal ADMM iterations across {len(rec['iter'])} MPC solves: {total_iters}")


if __name__ == "__main__":
    main()
