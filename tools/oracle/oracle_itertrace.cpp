// Golden-data oracle: per-iteration ADMM state trace on the quadrotor
// hovering problem. Uses max_iter=1 so each tiny_solve() call performs
// exactly one ADMM iteration (reference admm.cpp:378-448), dumping the full
// workspace after each. Lets the TPU implementation be validated one
// iteration at a time instead of only end-to-end.
#include <cstdio>
#include <tinympc/tiny_api.hpp>

#define NSTATES 12
#define NINPUTS 4
#define NHORIZON 10

#include "problem_data/quadrotor_20hz_params.hpp"
#include "json.hpp"

int main(int argc, char** argv) {
    FILE* f = fopen(argc > 1 ? argv[1] : "itertrace.json", "w");

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
    solver->settings->max_iter = 1;          // one ADMM iteration per solve
    solver->settings->check_termination = 1000;  // never terminate early

    TinyWorkspace* work = solver->work;
    tinyVector x0(NSTATES);
    x0 << 0, 1, 0, 0.2, 0, 0, 0.1, 0, 0, 0, 0, 0;
    tinyVector Xref_origin(NSTATES);
    Xref_origin << 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0;
    work->Xref = Xref_origin.replicate(1, NHORIZON);
    tiny_set_x0(solver, x0);

    fprintf(f, "{\"cache\":");
    json_cache(f, solver);
    fprintf(f, ",\"iters\":[");
    for (int it = 0; it < 30; ++it) {
        tiny_solve(solver);
        json_iter_state(f, it == 0, solver);
    }
    fprintf(f, "]}\n");
    fclose(f);
    return 0;
}
