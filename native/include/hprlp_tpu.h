/* hprlp_tpu — C ABI for the TPU-native HPR-LP solver.
 *
 * API-surface parity with the reference C API (reference:
 * include/HPRLP.h:23-25 extern-C model API: create_model_from_arrays /
 * create_model_from_mps / solve / free_model), re-architected for this
 * framework: the compute engine is a Python/JAX process, so this library
 * drives ONE warm `python -m hprlp_tpu.server` worker over pipes (JSON +
 * base64 protocol) instead of linking the solver in-process.  The worker
 * starts lazily on the first solve and is reused; call hprlp_shutdown()
 * to stop it.
 *
 * Problem form:  minimize c'x  s.t.  AL <= A x <= AU,  l <= x <= u.
 * A is CSR with int64 row pointers and int32 column indices.
 * Infinities: use +/-HUGE_VAL (or anything with |v| >= 1e30).
 *
 * Environment: HPRLP_TPU_PYTHON overrides the python executable;
 * HPRLP_TPU_ROOT overrides the repo root put on PYTHONPATH.
 */
#ifndef HPRLP_TPU_H
#define HPRLP_TPU_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct hprlp_model hprlp_model;

typedef struct {
    double stop_tol;       /* default 1e-4 */
    double time_limit;     /* seconds, default 3600 */
    int64_t max_iter;      /* default INT32_MAX */
    int check_iter;        /* default 150 */
    int use_CR_scaling;    /* defaults 1 (parity: structs.h:34-39) */
    int use_Ruiz_scaling;
    int use_Pock_Chambolle_scaling;
    int use_bc_scaling;
    int use_presolve;
    char precision[8];     /* "auto" | "f32" | "f64" | "mixed" */
} hprlp_parameters;

typedef struct {
    char status[16];       /* OPTIMAL / ITER_LIMIT / ... */
    int64_t iter;
    double time;
    double primal_obj;
    double dual_obj;
    double gap;
    double residuals;
    int64_t iter4, iter6, iter8;
    double time4, time6, time8;
    int64_t n, m;          /* lengths of x/z and y */
    double *x;             /* owned by the results object */
    double *y;
    double *z;
} hprlp_results;

/* Fill params with the defaults above. */
void hprlp_parameters_default(hprlp_parameters *p);

/* Build a model (host-side copy of the data; never NULL — a NULL return
 * means allocation failure only). */
hprlp_model *hprlp_create_model_from_arrays(
    int64_t m, int64_t n,
    const int64_t *Ap, const int32_t *Ai, const double *Ax,
    const double *AL, const double *AU,
    const double *l, const double *u, const double *c,
    double obj_constant);

/* Model backed by an MPS file (parsed server-side at solve time). */
hprlp_model *hprlp_create_model_from_mps(const char *path);

/* Solve; returns a results object to free with hprlp_free_results, or
 * NULL on transport failure (see hprlp_last_error()).  A solver-side
 * failure returns a results object with status "ERROR". */
hprlp_results *hprlp_solve(hprlp_model *model,
                           const hprlp_parameters *params);

/* Last transport/protocol error message (thread-unsafe, static). */
const char *hprlp_last_error(void);

void hprlp_free_results(hprlp_results *r);
void hprlp_free_model(hprlp_model *m);

/* Stop the background worker process (restarted lazily if needed). */
void hprlp_shutdown(void);

#ifdef __cplusplus
}
#endif

#endif /* HPRLP_TPU_H */
