/* hpres — native LP presolver for the TPU HPR-LP framework.
 *
 * Role parity with the reference's embedded PSLP presolver
 * (reference: third_party/PSLP, src/pslp_integration.cpp), re-designed and
 * written from scratch in C++:
 *   - reductions: empty/singleton/redundant/forcing rows, fixed/empty
 *     columns, dual fixing via up/down locks, free singleton column
 *     substitution, parallel rows, activity-based primal propagation
 *     (detection-only: implied bounds are used to fix variables and drop
 *     rows but are NOT installed, keeping dual postsolve exact)
 *   - typed postsolve log replayed in reverse to recover (x, y, z) in the
 *     original space (parity: PSLP include/core/Postsolver.h semantics)
 *
 * Problem form (same as the solver):
 *     minimize c'x   s.t.  AL <= A x <= AU,  l <= x <= u
 *
 * C ABI consumed from Python via ctypes.  All arrays are caller-allocated.
 */
#ifndef HPRES_H
#define HPRES_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct hpres_handle hpres_handle;

/* Status codes. */
enum {
    HPRES_OK = 0,
    HPRES_INFEASIBLE = 1,
    HPRES_UNBOUNDED = 2,
    HPRES_ERROR = 3,
};

/* Run presolve on a CSR LP.  Returns a handle owning the reduced problem
 * and the postsolve log (never NULL; check hpres_status). */
hpres_handle *hpres_presolve(
    int64_t m, int64_t n,
    const int64_t *Ap, const int32_t *Ai, const double *Ax, /* CSR of A */
    const double *AL, const double *AU,
    const double *l, const double *u, const double *c,
    double feas_tol,     /* feasibility tolerance (reference: 1e-6) */
    int max_rounds);     /* reduction rounds (0 = default) */

int hpres_status(const hpres_handle *h);

/* Reduced problem dimensions. */
int64_t hpres_reduced_m(const hpres_handle *h);
int64_t hpres_reduced_n(const hpres_handle *h);
int64_t hpres_reduced_nnz(const hpres_handle *h);
/* Objective constant accumulated by fixed variables. */
double hpres_obj_shift(const hpres_handle *h);

/* Copy the reduced problem out (arrays sized by the getters above;
 * Ap has reduced_m + 1 entries). */
void hpres_get_reduced(const hpres_handle *h,
                       int64_t *Ap, int32_t *Ai, double *Ax,
                       double *AL, double *AU,
                       double *l, double *u, double *c);

/* Map a reduced-space solution back to the original space.
 * x/y/z are original-sized outputs; x_red/y_red/z_red reduced-sized. */
void hpres_postsolve(const hpres_handle *h,
                     const double *x_red, const double *y_red,
                     const double *z_red,
                     double *x, double *y, double *z);

/* Reduction statistics (optional, for logging). */
void hpres_stats(const hpres_handle *h, int64_t *rows_removed,
                 int64_t *cols_removed, int64_t *nnz_removed,
                 int64_t *rounds);

void hpres_free(hpres_handle *h);

#ifdef __cplusplus
}
#endif

#endif /* HPRES_H */
