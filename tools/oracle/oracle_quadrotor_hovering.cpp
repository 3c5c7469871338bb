// Golden-data oracle: replays reference examples/quadrotor_hovering.cpp.
// With argv[2] == "adaptive", additionally enables the adaptive-rho subsystem
// (settings->adaptive_rho = 1 + sensitivity tables), which no reference
// example exercises but the library supports (reference admm.cpp:397-422).
#include <cstdio>
#include <cstring>
#include <tinympc/tiny_api.hpp>

#define NSTATES 12
#define NINPUTS 4
#define NHORIZON 10

#include "problem_data/quadrotor_20hz_params.hpp"
#include "json.hpp"

int main(int argc, char** argv) {
    FILE* f = fopen(argc > 1 ? argv[1] : "quadrotor_hovering.json", "w");
    bool adaptive = argc > 2 && strcmp(argv[2], "adaptive") == 0;

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
    solver->settings->max_iter = 100;
    if (adaptive) {
        solver->settings->adaptive_rho = 1;
        tiny_initialize_sensitivity_matrices(solver);
    }

    TinyWorkspace* work = solver->work;
    tinyVector x0(NSTATES);
    x0 << 0, 1, 0, 0.2, 0, 0, 0.1, 0, 0, 0, 0, 0;
    tinyVector Xref_origin(NSTATES);
    Xref_origin << 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0;
    work->Xref = Xref_origin.replicate(1, NHORIZON);

    fprintf(f, "{\"cache\":");
    json_cache(f, solver);
    if (adaptive) {
        json_key(f, "dKinf_drho"); json_matrix(f, solver->cache->dKinf_drho);
        json_key(f, "dPinf_drho"); json_matrix(f, solver->cache->dPinf_drho);
        json_key(f, "dC1_drho"); json_matrix(f, solver->cache->dC1_drho);
        json_key(f, "dC2_drho"); json_matrix(f, solver->cache->dC2_drho);
    }
    fprintf(f, ",\"steps\":[");
    for (int k = 0; k < 100; ++k) {
        tiny_set_x0(solver, x0);
        tiny_solve(solver);
        json_step(f, k == 0, x0, work->u.col(0), solver);
        x0 = work->Adyn * x0 + work->Bdyn * work->u.col(0);
    }
    fprintf(f, "]");
    if (adaptive) {
        // Final (rho-adapted) cache after the whole run.
        json_key(f, "final_rho"); json_scalar(f, solver->cache->rho);
        json_key(f, "final_Kinf"); json_matrix(f, solver->cache->Kinf);
        json_key(f, "final_Pinf"); json_matrix(f, solver->cache->Pinf);
    }
    fprintf(f, "}\n");
    fclose(f);
    return 0;
}
