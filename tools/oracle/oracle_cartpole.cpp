// Golden-data oracle: replays the reference cartpole closed loop
// (reference examples/cartpole_example.cpp) and dumps JSON.
#include <cstdio>
#include <tinympc/tiny_api.hpp>
#include "json.hpp"

#define NSTATES 4
#define NINPUTS 1
#define NHORIZON 10
#define NTOTAL 400

int main(int argc, char** argv) {
    FILE* f = fopen(argc > 1 ? argv[1] : "cartpole.json", "w");

    TinySolver* solver;
    tinytype rho_value = 1.0;
    tinytype Adyn_data[NSTATES * NSTATES] = {1.0, 0.01, 0.0, 0.0, 0.0, 1.0, 0.039, 0.0, 0.0, 0.0, 1.002, 0.01, 0.0, 0.0, 0.458, 1.002};
    tinytype Bdyn_data[NSTATES * NINPUTS] = {0.0, 0.02, 0.0, 0.067};
    tinytype Q_data[NSTATES] = {10.0, 1.0, 10.0, 1.0};
    tinytype R_data[NINPUTS] = {1.0};

    tinyMatrix Adyn = Map<Matrix<tinytype, NSTATES, NSTATES, RowMajor>>(Adyn_data);
    tinyMatrix Bdyn = Map<Matrix<tinytype, NSTATES, NINPUTS>>(Bdyn_data);
    tinyVector fdyn = Matrix<tinytype, NSTATES, 1>::Zero();
    tinyVector Q = Map<Matrix<tinytype, NSTATES, 1>>(Q_data);
    tinyVector R = Map<Matrix<tinytype, NINPUTS, 1>>(R_data);

    tinyMatrix x_min = Matrix<tinytype, NSTATES, NHORIZON>::Constant(-1e17);
    tinyMatrix x_max = Matrix<tinytype, NSTATES, NHORIZON>::Constant(1e17);
    tinyMatrix u_min = Matrix<tinytype, NINPUTS, NHORIZON - 1>::Constant(-1e17);
    tinyMatrix u_max = Matrix<tinytype, NINPUTS, NHORIZON - 1>::Constant(1e17);

    tiny_setup(&solver, Adyn, Bdyn, fdyn, Q.asDiagonal(), R.asDiagonal(),
               rho_value, NSTATES, NINPUTS, NHORIZON, 0);
    tiny_set_bound_constraints(solver, x_min, x_max, u_min, u_max);
    solver->settings->max_iter = 100;

    TinyWorkspace* work = solver->work;
    tinyVector x0(NSTATES);
    x0 << 0.5, 0.0, 0.0, 0.0;
    tinyVector Xref_origin(NSTATES);
    Xref_origin << 1.0, 0, 0, 0;
    work->Xref = Xref_origin.replicate(1, NHORIZON);

    fprintf(f, "{\"cache\":");
    json_cache(f, solver);
    fprintf(f, ",\"steps\":[");
    for (int k = 0; k < NTOTAL - NHORIZON; ++k) {
        tiny_set_x0(solver, x0);
        tiny_solve(solver);
        json_step(f, k == 0, x0, work->u.col(0), solver);
        x0 = work->Adyn * x0 + work->Bdyn * work->u.col(0);
    }
    fprintf(f, "]}\n");
    fclose(f);
    return 0;
}
