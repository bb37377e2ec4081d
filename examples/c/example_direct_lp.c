/* C ABI demo: solve the 2x2 ground-truth LP directly from arrays
 * (parity: reference examples/c/example_direct_lp.c — same LP, same
 * expected optimum obj = -26.4, x = (2.8, 3.6)).
 *
 * Build (after `make` in native/):
 *   gcc example_direct_lp.c -I../../native/include \
 *       -L../../native/lib -lhprlp_tpu -o example_direct_lp
 *   LD_LIBRARY_PATH=../../native/lib ./example_direct_lp
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "hprlp_tpu.h"

int main(void) {
    /* min -3 x1 - 5 x2  s.t.  x1 + 2 x2 <= 10,  3 x1 + x2 <= 12, x >= 0 */
    int64_t Ap[] = {0, 2, 4};
    int32_t Ai[] = {0, 1, 0, 1};
    double Ax[] = {1.0, 2.0, 3.0, 1.0};
    double AL[] = {-HUGE_VAL, -HUGE_VAL};
    double AU[] = {10.0, 12.0};
    double l[] = {0.0, 0.0};
    double u[] = {HUGE_VAL, HUGE_VAL};
    double c[] = {-3.0, -5.0};

    hprlp_model *model = hprlp_create_model_from_arrays(
        2, 2, Ap, Ai, Ax, AL, AU, l, u, c, 0.0);
    if (!model) {
        fprintf(stderr, "model allocation failed\n");
        return 1;
    }

    hprlp_parameters params;
    hprlp_parameters_default(&params);
    params.stop_tol = 1e-6;
    snprintf(params.precision, sizeof(params.precision), "f64");

    hprlp_results *res = hprlp_solve(model, &params);
    if (!res) {
        fprintf(stderr, "solve failed: %s\n", hprlp_last_error());
        hprlp_free_model(model);
        return 1;
    }

    printf("status: %s\n", res->status);
    printf("iterations: %lld\n", (long long)res->iter);
    printf("objective: %.6f\n", res->primal_obj);
    if (res->n >= 2) printf("x = (%.4f, %.4f)\n", res->x[0], res->x[1]);

    int ok = res->primal_obj < -26.3 && res->primal_obj > -26.5;
    hprlp_free_results(res);
    hprlp_free_model(model);
    hprlp_shutdown();
    if (!ok) {
        fprintf(stderr, "objective mismatch\n");
        return 1;
    }
    printf("OK\n");
    return 0;
}
