/* C ABI demo: batched shared-A solve — B=3 LPs sharing the 2x2 demo
 * matrix with per-batch costs/bounds (parity: reference
 * examples/c/example_batched_lp.c:11-88 — same matrix, same batch
 * variations; the first member is the ground-truth LP, obj = -26.4).
 *
 * Build (after `make` in native/):
 *   gcc example_batched_lp.c -I../../native/include \
 *       -L../../native/lib -lhprlp_tpu -o example_batched_lp
 *   LD_LIBRARY_PATH=../../native/lib ./example_batched_lp
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "hprlp_tpu.h"

int main(void) {
    int64_t m = 2, n = 2;
    int64_t Ap[] = {0, 2, 4};
    int32_t Ai[] = {0, 1, 0, 1};
    double Ax[] = {1.0, 2.0, 3.0, 1.0};

    /* Base vectors are placeholders: solve_batched ignores the model's
     * vectors and uses the per-batch buffers below. */
    double zAL[] = {-HUGE_VAL, -HUGE_VAL};
    double zAU[] = {10.0, 12.0};
    double zl[] = {0.0, 0.0};
    double zu[] = {HUGE_VAL, HUGE_VAL};
    double zc[] = {-3.0, -5.0};

    hprlp_model *model = hprlp_create_model_from_arrays(
        m, n, Ap, Ai, Ax, zAL, zAU, zl, zu, zc, 0.0);
    if (!model) {
        fprintf(stderr, "model allocation failed\n");
        return 1;
    }

    int64_t B = 3;
    /* Column-major (dim, B): member k's vector is the k-th column. */
    double C[] = {-3.0, -5.0, /* k=0: the ground-truth LP */
                  -2.0, -6.0,
                  -4.0, -4.0};
    double AL[] = {-HUGE_VAL, -HUGE_VAL,
                   -HUGE_VAL, -HUGE_VAL,
                   -HUGE_VAL, -HUGE_VAL};
    double AU[] = {10.0, 12.0,
                   9.0, 13.0,
                   11.0, 11.0};
    double l[] = {0.0, 0.0,
                  0.0, 0.0,
                  0.0, 0.0};
    double u[] = {HUGE_VAL, HUGE_VAL,
                  HUGE_VAL, HUGE_VAL,
                  4.0, HUGE_VAL};

    hprlp_parameters params;
    hprlp_parameters_default(&params);
    params.stop_tol = 1e-6;

    hprlp_batched_results *res = hprlp_solve_batched(
        model, B, C, AL, AU, l, u, /*obj_constants=*/NULL, &params);
    if (!res) {
        fprintf(stderr, "batched solve failed: %s\n", hprlp_last_error());
        hprlp_free_model(model);
        return 1;
    }

    int ok = 1;
    for (int64_t k = 0; k < res->batch_size; ++k) {
        const char *st = res->status + k * HPRLP_STATUS_STRLEN;
        printf("member %lld: status=%s iter=%lld obj=%.6f "
               "x=(%.4f, %.4f)\n",
               (long long)k, st, (long long)res->iter[k],
               res->primal_obj[k], res->x[k * res->n],
               res->x[k * res->n + 1]);
        if (st[0] != 'O') ok = 0; /* OPTIMAL */
    }
    /* Member 0 is the ground-truth LP: obj -26.4, x = (2.8, 3.6). */
    if (!(res->primal_obj[0] < -26.3 && res->primal_obj[0] > -26.5)) ok = 0;
    printf("setup %.3fs solve %.3fs power %.3fs\n", res->setup_time,
           res->solve_time, res->power_time);

    hprlp_free_batched_results(res);
    hprlp_free_model(model);
    hprlp_shutdown();
    if (!ok) {
        fprintf(stderr, "batched results mismatch\n");
        return 1;
    }
    printf("OK\n");
    return 0;
}
