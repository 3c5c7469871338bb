// Baseline benchmark: reference TinyMPC solves/s on one CPU core.
// Workload matches bench.py: quadrotor 20 Hz params, N=20 horizon, box
// constraints +-5 / +-0.5, tol 1e-3, max_iter=100, cold-start solves with
// x0 ~ U[-0.5, 0.5]^12, Xref = hover at z=1. Prints one JSON line.
#include <chrono>
#include <cstdio>
#include <random>
#include <tinympc/tiny_api.hpp>

#define NSTATES 12
#define NINPUTS 4
#define NHORIZON 20

#include "problem_data/quadrotor_20hz_params.hpp"

int main(int argc, char** argv) {
    int num_solves = argc > 1 ? atoi(argv[1]) : 2000;
    int max_iter = argc > 2 ? atoi(argv[2]) : 100;
    int adaptive = argc > 3 ? atoi(argv[3]) : 0;  // adaptive-rho on/off
    int check_term = argc > 4 ? atoi(argv[4]) : 1;  // termination stride
    // Optional 5th arg: path to a text file of initial states (one x0
    // per line, NSTATES whitespace-separated values). Used to feed the
    // oracle the *exact* x0 batch a TPU benchmark solved, so the
    // solved-fraction comparison separates RNG-draw variance from
    // precision effects (round 5; tools/solved_frac_decompose.py dumps
    // the batch from bench.py's generator).
    const char* x0_path = argc > 5 ? argv[5] : nullptr;

    TinySolver* solver;
    tinyMatrix Adyn = Map<Matrix<tinytype, NSTATES, NSTATES, RowMajor>>(Adyn_data);
    tinyMatrix Bdyn = Map<Matrix<tinytype, NSTATES, NINPUTS, RowMajor>>(Bdyn_data);
    tinyVector fdyn = Matrix<tinytype, NSTATES, 1>::Zero();
    tinyVector Q = Map<Matrix<tinytype, NSTATES, 1>>(Q_data);
    tinyVector R = Map<Matrix<tinytype, NINPUTS, 1>>(R_data);

    tinyMatrix x_min = Matrix<tinytype, NSTATES, NHORIZON>::Constant(-5);
    tinyMatrix x_max = Matrix<tinytype, NSTATES, NHORIZON>::Constant(5);
    tinyMatrix u_min = Matrix<tinytype, NINPUTS, NHORIZON - 1>::Constant(-0.5);
    tinyMatrix u_max = Matrix<tinytype, NINPUTS, NHORIZON - 1>::Constant(0.5);

    tiny_setup(&solver, Adyn, Bdyn, fdyn, Q.asDiagonal(), R.asDiagonal(),
               rho_value, NSTATES, NINPUTS, NHORIZON, 0);
    tiny_set_bound_constraints(solver, x_min, x_max, u_min, u_max);
    solver->settings->max_iter = max_iter;
    solver->settings->check_termination = check_term;
    if (adaptive) {
        // The reference's adaptive-rho configuration (IROS-2025 path):
        // enable before sensitivity init, which loads the hard-coded 12x4
        // quadrotor tables (tiny_api.cpp:479-540).
        solver->settings->adaptive_rho = 1;
        solver->settings->adaptive_rho_min = 1.0;
        solver->settings->adaptive_rho_max = 100.0;
        solver->settings->adaptive_rho_enable_clipping = 1;
        tiny_initialize_sensitivity_matrices(solver);
    }
    // Snapshot the cache so each solve cold-starts from the base rho
    // (adaptive solves Taylor-mutate Kinf/Pinf/C1/C2 and rho in place;
    // the batched TPU solves being compared give every problem its own
    // fresh rho).
    const tinytype rho_base = solver->cache->rho;
    tinyMatrix Kinf0 = solver->cache->Kinf, Pinf0 = solver->cache->Pinf;
    tinyMatrix C10 = solver->cache->C1, C20 = solver->cache->C2;

    TinyWorkspace* work = solver->work;
    tinyVector xref(NSTATES);
    xref << 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0;
    work->Xref = xref.replicate(1, NHORIZON);

    std::mt19937 gen(0);
    std::uniform_real_distribution<double> dist(-0.5, 0.5);

    // Pre-generate initial states (or load the exact batch from a file).
    std::vector<tinyVector> x0s;
    if (x0_path) {
        FILE* fp = fopen(x0_path, "r");
        if (!fp) { fprintf(stderr, "cannot open %s\n", x0_path); return 1; }
        tinyVector x0(NSTATES);
        while (true) {
            int got = 0;
            for (int i = 0; i < NSTATES; i++) {
                double v;
                if (fscanf(fp, "%lf", &v) == 1) { x0(i) = v; got++; }
            }
            if (got < NSTATES) break;
            x0s.push_back(x0);
            if ((int)x0s.size() >= num_solves && num_solves > 0) break;
        }
        fclose(fp);
        num_solves = (int)x0s.size();
        if (!num_solves) { fprintf(stderr, "no x0s in %s\n", x0_path); return 1; }
    } else {
        x0s.assign(num_solves, tinyVector(NSTATES));
        for (auto& x0 : x0s)
            for (int i = 0; i < NSTATES; i++) x0(i) = dist(gen);
    }

    long total_iters = 0;
    long num_solved = 0;
    // Warm-up solve (first-touch costs).
    tiny_set_x0(solver, x0s[0]);
    tiny_solve(solver);

    auto t0 = std::chrono::steady_clock::now();
    for (int k = 0; k < num_solves; k++) {
        // Cold start: zero all iterates (matching a fresh batched solve).
        work->x.setZero(); work->u.setZero();
        work->v.setZero(); work->vnew.setZero();
        work->z.setZero(); work->znew.setZero();
        work->g.setZero(); work->y.setZero();
        if (adaptive) {
            solver->cache->rho = rho_base;
            solver->cache->Kinf = Kinf0; solver->cache->Pinf = Pinf0;
            solver->cache->C1 = C10; solver->cache->C2 = C20;
        }
        tiny_set_x0(solver, x0s[k]);
        tiny_solve(solver);
        total_iters += solver->solution->iter;
        num_solved += solver->solution->solved;
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();

    fprintf(stderr,
            "{\"solves\":%d,\"max_iter\":%d,\"adaptive\":%d,"
            "\"check_termination\":%d,\"seconds\":%.6f,"
            "\"solves_per_s\":%.1f,\"total_iters\":%ld,\"iters_per_s\":%.1f,"
            "\"avg_iters\":%.2f,\"solved_frac\":%.4f}\n",
            num_solves, max_iter, adaptive, check_term, secs,
            num_solves / secs,
            total_iters, total_iters / secs,
            (double)total_iters / num_solves,
            (double)num_solved / num_solves);
    return 0;
}
