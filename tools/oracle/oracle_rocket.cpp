// Golden-data oracle: replays reference examples/rocket_landing_mpc.cpp
// (SOC constraints + affine dynamics). Note the reference example passes
// (Acu,qcu,cu) into the (Acx,qcx,cx) parameters of tiny_set_cone_constraints
// (rocket_landing_mpc.cpp:94 vs tiny_api.hpp) — the state cone ends up with
// mu=0.25 and the input cone with mu=0.5. Replayed verbatim. Note also that
// the reference example never sets en_state_soc/en_input_soc (defaults 0,
// tiny_api_constants.hpp:11-12), so it actually solves box-only; pass
// argv[2] == "soc" to enable the cones and exercise the SOC path.
#include <cstdio>
#include <cstring>
#include <tinympc/tiny_api.hpp>

#define NSTATES 6
#define NINPUTS 3
#define NHORIZON 10
#define NTOTAL 100

#include "problem_data/rocket_landing_params_20hz.hpp"
#include "json.hpp"

int main(int argc, char** argv) {
    FILE* f = fopen(argc > 1 ? argv[1] : "rocket.json", "w");

    TinySolver* solver;
    tinyMatrix Adyn = Map<Matrix<tinytype, NSTATES, NSTATES, RowMajor>>(Adyn_data);
    tinyMatrix Bdyn = Map<Matrix<tinytype, NSTATES, NINPUTS, RowMajor>>(Bdyn_data);
    tinyVector fdyn = Map<Matrix<tinytype, NSTATES, 1>>(fdyn_data);
    tinyVector Q = Map<Matrix<tinytype, NSTATES, 1>>(Q_data);
    tinyVector R = Map<Matrix<tinytype, NINPUTS, 1>>(R_data);

    tinyVector x_min_one(NSTATES), x_max_one(NSTATES);
    x_min_one << -5.0, -5.0, -0.5, -10.0, -10.0, -20.0;
    x_max_one << 5.0, 5.0, 100.0, 10.0, 10.0, 20.0;
    tinyMatrix x_min = x_min_one.replicate(1, NHORIZON);
    tinyMatrix x_max = x_max_one.replicate(1, NHORIZON);
    tinyMatrix u_min = Matrix<tinytype, NINPUTS, NHORIZON - 1>::Constant(-10);
    tinyMatrix u_max = Matrix<tinytype, NINPUTS, NHORIZON - 1>::Constant(105);

    tinyVector cx(1), cu(1);
    cx << 0.5;
    cu << 0.25;
    VectorXi Acx(1), Acu(1), qcx(1), qcu(1);
    Acx << 0;
    Acu << 0;
    qcx << 3;
    qcu << 3;

    tiny_setup(&solver, Adyn, Bdyn, fdyn, Q.asDiagonal(), R.asDiagonal(),
               rho_value, NSTATES, NINPUTS, NHORIZON, 0);
    tiny_set_bound_constraints(solver, x_min, x_max, u_min, u_max);
    // Same (swapped) argument order as the reference example.
    tiny_set_cone_constraints(solver, Acu, qcu, cu, Acx, qcx, cx);
    solver->settings->max_iter = 100;
    solver->settings->abs_pri_tol = 2e-03;
    if (argc > 2 && strcmp(argv[2], "soc") == 0) {
        solver->settings->en_state_soc = 1;
        solver->settings->en_input_soc = 1;
    }

    TinyWorkspace* work = solver->work;
    tinyVector xinit(NSTATES), xg(NSTATES);
    xinit << 4, 2, 20, -3, 2, -4.5;
    tinyVector x0 = xinit * 1.1;
    xg.setZero();

    for (int i = 0; i < NHORIZON - 1; i++) work->Uref.col(i)(2) = 10;
    for (int i = 0; i < NHORIZON; i++)
        work->Xref.col(i) = xinit + (xg - xinit) * tinytype(i) / (NTOTAL - 1);
    work->p.col(NHORIZON - 1) = -solver->cache->Pinf * work->Xref.col(NHORIZON - 1);

    fprintf(f, "{\"cache\":");
    json_cache(f, solver);
    fprintf(f, ",\"steps\":[");
    for (int k = 0; k < NTOTAL - NHORIZON; k++) {
        work->x.col(0) = x0;
        for (int i = 0; i < NHORIZON; i++) {
            work->Xref.col(i) = xinit + (xg - xinit) * tinytype(i + k) / (NTOTAL - 1);
            if (i < NHORIZON - 1) work->Uref.col(i)(2) = 10;
        }
        tiny_solve(solver);
        json_step(f, k == 0, x0, work->u.col(0), solver);
        x0 = work->Adyn * x0 + work->Bdyn * work->u.col(0) + work->fdyn;
    }
    fprintf(f, "]}\n");
    fclose(f);
    return 0;
}
