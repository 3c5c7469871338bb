// Golden-data oracle: replays reference examples/quadrotor_tracking.cpp
// (receding-horizon trajectory tracking with per-step dual reset).
#include <cstdio>
#include <tinympc/tiny_api.hpp>

#define NSTATES 12
#define NINPUTS 4
#define NHORIZON 10
#define NTOTAL 301

#include "problem_data/quadrotor_20hz_params.hpp"
#include "trajectory_data/quadrotor_20hz_y_axis_line.hpp"
#include "json.hpp"

int main(int argc, char** argv) {
    FILE* f = fopen(argc > 1 ? argv[1] : "quadrotor_tracking.json", "w");

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

    TinyWorkspace* work = solver->work;
    Matrix<tinytype, NSTATES, NTOTAL> Xref_total =
        Map<Matrix<tinytype, NSTATES, NTOTAL>>(Xref_data);
    work->Xref = Xref_total.block<NSTATES, NHORIZON>(0, 0);
    tinyVector x0 = work->Xref.col(0);

    fprintf(f, "{\"cache\":");
    json_cache(f, solver);
    fprintf(f, ",\"steps\":[");
    for (int k = 0; k < NTOTAL - NHORIZON; ++k) {
        tiny_set_x0(solver, x0);
        work->Xref = Xref_total.block<NSTATES, NHORIZON>(0, k);
        work->y = Matrix<tinytype, NINPUTS, NHORIZON - 1>::Zero();
        work->g = Matrix<tinytype, NSTATES, NHORIZON>::Zero();
        tiny_solve(solver);
        json_step(f, k == 0, x0, work->u.col(0), solver);
        x0 = work->Adyn * x0 + work->Bdyn * work->u.col(0);
    }
    fprintf(f, "]}\n");
    fclose(f);
    return 0;
}
