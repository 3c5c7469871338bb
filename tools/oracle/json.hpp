// Minimal JSON emission helpers for golden-data dumps from the reference
// TinyMPC solver. This file is test tooling owned by tinympc-tpu; it links
// against the reference library at /root/reference but is not part of it.
#pragma once

#include <cstdio>
#include <string>
#include <tinympc/types.hpp>

inline void json_scalar(FILE* f, tinytype v) { fprintf(f, "%.17g", (double)v); }

// Emit an Eigen matrix as a nested (row-major) JSON array.
inline void json_matrix(FILE* f, const tinyMatrix& m) {
    fprintf(f, "[");
    for (int r = 0; r < m.rows(); r++) {
        if (r) fprintf(f, ",");
        fprintf(f, "[");
        for (int c = 0; c < m.cols(); c++) {
            if (c) fprintf(f, ",");
            json_scalar(f, m(r, c));
        }
        fprintf(f, "]");
    }
    fprintf(f, "]");
}

inline void json_vector(FILE* f, const tinyVector& v) {
    fprintf(f, "[");
    for (int r = 0; r < v.rows(); r++) {
        if (r) fprintf(f, ",");
        json_scalar(f, v(r));
    }
    fprintf(f, "]");
}

inline void json_key(FILE* f, const char* k, bool lead_comma = true) {
    if (lead_comma) fprintf(f, ",");
    fprintf(f, "\"%s\":", k);
}

// Dump the solver cache + augmented cost diagonals (everything precomputed at
// setup) as one JSON object.
inline void json_cache(FILE* f, TinySolver* solver) {
    fprintf(f, "{\"rho\":");
    json_scalar(f, solver->cache->rho);
    json_key(f, "Kinf"); json_matrix(f, solver->cache->Kinf);
    json_key(f, "Pinf"); json_matrix(f, solver->cache->Pinf);
    json_key(f, "Quu_inv"); json_matrix(f, solver->cache->Quu_inv);
    json_key(f, "AmBKt"); json_matrix(f, solver->cache->AmBKt);
    json_key(f, "APf"); json_vector(f, solver->cache->APf);
    json_key(f, "BPf"); json_vector(f, solver->cache->BPf);
    json_key(f, "Q_aug"); json_vector(f, solver->work->Q);
    json_key(f, "R_aug"); json_vector(f, solver->work->R);
    fprintf(f, "}");
}

// Dump one closed-loop step record.
inline void json_step(FILE* f, bool first, const tinyVector& x0,
                      const tinyVector& u0, TinySolver* solver) {
    if (!first) fprintf(f, ",");
    fprintf(f, "{\"x0\":");
    json_vector(f, x0);
    json_key(f, "u0"); json_vector(f, u0);
    json_key(f, "iter"); fprintf(f, "%d", solver->solution->iter);
    json_key(f, "solved"); fprintf(f, "%d", solver->solution->solved);
    json_key(f, "pri_res_state"); json_scalar(f, solver->work->primal_residual_state);
    json_key(f, "dua_res_state"); json_scalar(f, solver->work->dual_residual_state);
    json_key(f, "pri_res_input"); json_scalar(f, solver->work->primal_residual_input);
    json_key(f, "dua_res_input"); json_scalar(f, solver->work->dual_residual_input);
    fprintf(f, "}");
}

// Dump full iterate state (for iteration-level traces).
inline void json_iter_state(FILE* f, bool first, TinySolver* solver) {
    if (!first) fprintf(f, ",");
    TinyWorkspace* w = solver->work;
    fprintf(f, "{\"x\":");
    json_matrix(f, w->x);
    json_key(f, "u"); json_matrix(f, w->u);
    json_key(f, "vnew"); json_matrix(f, w->vnew);
    json_key(f, "znew"); json_matrix(f, w->znew);
    json_key(f, "g"); json_matrix(f, w->g);
    json_key(f, "y"); json_matrix(f, w->y);
    json_key(f, "q"); json_matrix(f, w->q);
    json_key(f, "r"); json_matrix(f, w->r);
    json_key(f, "p"); json_matrix(f, w->p);
    json_key(f, "d"); json_matrix(f, w->d);
    json_key(f, "v"); json_matrix(f, w->v);
    json_key(f, "z"); json_matrix(f, w->z);
    json_key(f, "solved"); fprintf(f, "%d", solver->solution->solved);
    json_key(f, "rho"); json_scalar(f, solver->cache->rho);
    fprintf(f, "}");
}
