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

/* Library version (parity: reference include/version.h:13-21 — version
 * macros + compile-time check).  Keep in sync with hprlp_tpu.__version__
 * and pyproject.toml. */
#define HPRLP_TPU_VERSION_MAJOR 0
#define HPRLP_TPU_VERSION_MINOR 1
#define HPRLP_TPU_VERSION_PATCH 0
#define HPRLP_TPU_VERSION "0.1.0"
#define HPRLP_TPU_VERSION_AT_LEAST(maj, min) \
    (HPRLP_TPU_VERSION_MAJOR > (maj) ||      \
     (HPRLP_TPU_VERSION_MAJOR == (maj) && HPRLP_TPU_VERSION_MINOR >= (min)))

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

/* Batched shared-A results (parity: HPRLP_batched_results,
 * reference include/structs.h:68-90).  All per-batch arrays are owned by
 * the results object; x/z are column-major n x batch, y is m x batch. */
typedef struct {
    int64_t m, n, batch_size;
    double *x;            /* (n, batch) column-major */
    double *y;            /* (m, batch) column-major */
    double *z;            /* (n, batch) column-major */
    double *primal_obj;   /* (batch,) */
    double *residuals;    /* (batch,) */
    double *gap;          /* (batch,) */
    int64_t *iter;        /* (batch,) */
    char *status;         /* batch contiguous 64-byte C strings */
    double time, setup_time, solve_time, power_time;
} hprlp_batched_results;

#define HPRLP_STATUS_STRLEN 64

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

/* As hprlp_create_model_from_arrays, but the matrix arrives in CSC
 * (column-compressed) layout: Ap has n+1 entries, Ai holds ROW indices
 * (< m), Ax column-major values.  Converted to CSR host-side with a
 * counting-sort transpose (parity: the reference accepts is_csc in
 * create_model_from_arrays and transposes, src/HPRLP.cu:354-396 /
 * src/utils.cu:203 — MATLAB/SciPy CSC consumers need no client-side
 * transpose). */
hprlp_model *hprlp_create_model_from_arrays_csc(
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

/* Batched shared-A solve (parity: extern-C solve_batched, reference
 * src/batched_solver.cu:939-1092): batch_size LPs sharing the model's
 * sparse A, with per-batch dense data in COLUMN-MAJOR buffers —
 * C/l/u: (n, batch_size); AL/AU: (m, batch_size); obj_constants:
 * (batch_size,) or NULL for all-zero.  The model may come from arrays or
 * from an MPS file (its A is reused; its vectors are ignored).  Presolve
 * is forced off, as in the reference.  Returns a results object to free
 * with hprlp_free_batched_results, or NULL on transport failure. */
hprlp_batched_results *hprlp_solve_batched(
    hprlp_model *model, int64_t batch_size,
    const double *C, const double *AL, const double *AU,
    const double *l, const double *u, const double *obj_constants,
    const hprlp_parameters *params);

/* Last transport/protocol error message (thread-unsafe, static). */
const char *hprlp_last_error(void);

void hprlp_free_results(hprlp_results *r);
void hprlp_free_batched_results(hprlp_batched_results *r);
void hprlp_free_model(hprlp_model *m);

/* Stop the background worker process (restarted lazily if needed). */
void hprlp_shutdown(void);

#ifdef __cplusplus
}
#endif

#endif /* HPRLP_TPU_H */
