// Golden-data oracle: replays reference examples/quadrotor_linear_constraints.cpp
// (static hyperplane constraints, box constraints disabled). argv[2] == "tv"
// switches to the time-varying variant (quadrotor_tv_linear_constraints.cpp).
#include <cstdio>
#include <cstring>
#include <tinympc/tiny_api.hpp>

#define NSTATES 12
#define NINPUTS 4
#define NHORIZON 10
#define NTOTAL 50

#include "problem_data/quadrotor_50hz_params.hpp"
#include "json.hpp"

int main(int argc, char** argv) {
    FILE* f = fopen(argc > 1 ? argv[1] : "quadrotor_linear.json", "w");
    bool tv = argc > 2 && strcmp(argv[2], "tv") == 0;

    TinySolver* solver;
    tinyMatrix Adyn = Map<Matrix<tinytype, NSTATES, NSTATES, RowMajor>>(Adyn_data);
    tinyMatrix Bdyn = Map<Matrix<tinytype, NSTATES, NINPUTS, RowMajor>>(Bdyn_data);
    tinyVector fdyn = tinyVector::Zero(NSTATES);
    tinyVector Q = Map<Matrix<tinytype, NSTATES, 1>>(Q_data);
    tinyVector R = Map<Matrix<tinytype, NINPUTS, 1>>(R_data);

    tiny_setup(&solver, Adyn, Bdyn, fdyn, Q.asDiagonal(), R.asDiagonal(),
               rho_value, NSTATES, NINPUTS, NHORIZON, 0);

    tinyMatrix z_lim_total(1, NTOTAL);  // tv variant only
    tinyMatrix tv_Alin_x(NHORIZON, NSTATES), tv_blin_x(1, NHORIZON);
    tinyMatrix tv_Alin_u(NHORIZON - 1, NINPUTS), tv_blin_u(1, NHORIZON - 1);

    if (!tv) {
        tinyMatrix Alin_x(1, NSTATES);
        Alin_x.setZero();
        Alin_x(0, 2) = 1.0;
        tinyVector blin_x(1);
        blin_x << 3.0;
        tinyMatrix Alin_u(1, NINPUTS);
        Alin_u.setOnes();
        tinyVector blin_u(1);
        blin_u << 6.0;
        tiny_set_linear_constraints(solver, Alin_x, blin_x, Alin_u, blin_u);
        solver->settings->en_state_linear = 1;
        solver->settings->en_input_linear = 1;
    } else {
        for (int i = 0; i < NTOTAL; i++)
            z_lim_total(0, i) = 1.1 + (3.0 - 1.1) * i / (NTOTAL - NHORIZON - 1);
        tv_Alin_x.setZero();
        tv_blin_x.setZero();
        for (int i = 0; i < NHORIZON; i++) {
            tv_Alin_x(i, 2) = 1.0;
            tv_blin_x(0, i) = 3.0;
        }
        tv_Alin_u.setOnes();
        for (int i = 0; i < NHORIZON - 1; i++) tv_blin_u(0, i) = 6.0;
        tiny_set_tv_linear_constraints(solver, tv_Alin_x, tv_blin_x, tv_Alin_u, tv_blin_u);
        solver->settings->en_tv_state_linear = 1;
        solver->settings->en_tv_input_linear = 1;
    }

    solver->settings->max_iter = 100;
    solver->settings->abs_pri_tol = 1e-3;
    solver->settings->abs_dua_tol = 1e-3;
    solver->settings->en_state_bound = 0;
    solver->settings->en_input_bound = 0;

    TinyWorkspace* work = solver->work;
    tinyVector x0(NSTATES), xgoal(NSTATES);
    x0 << -2.0, -2.0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0, 0;
    xgoal << 2.0, 2.0, 4.0, 0, 0, 0, 0, 0, 0, 0, 0, 0;

    fprintf(f, "{\"cache\":");
    json_cache(f, solver);
    fprintf(f, ",\"steps\":[");
    for (int k = 0; k < NTOTAL - NHORIZON; ++k) {
        for (int i = 0; i < NHORIZON; i++) {
            tinytype alpha = tinytype(k + i) / (NTOTAL - 1);
            work->Xref.col(i) = (1 - alpha) * x0 + alpha * xgoal;
            if (tv) tv_blin_x(0, i) = z_lim_total(0, k + i);
        }
        tiny_set_x0(solver, x0);
        if (tv)
            tiny_set_tv_linear_constraints(solver, tv_Alin_x, tv_blin_x, tv_Alin_u, tv_blin_u);
        tiny_solve(solver);
        json_step(f, k == 0, x0, work->u.col(0), solver);
        if (solver->solution->solved) {
            x0 = work->Adyn * x0 + work->Bdyn * work->u.col(0) + work->fdyn;
        } else {
            x0 = 0.98 * x0 + 0.02 * xgoal;
        }
    }
    fprintf(f, "]}\n");
    fclose(f);
    return 0;
}
