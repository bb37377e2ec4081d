/* C ABI demo: solve an LP from an MPS file (parity: reference
 * examples/c/example_mps_file.c — the bundled data/model.mps 2x2 demo,
 * expected optimum obj = -26.4).
 *
 * Build (after `make` in native/):
 *   gcc example_mps_file.c -I../../native/include \
 *       -L../../native/lib -lhprlp_tpu -o example_mps_file
 *   LD_LIBRARY_PATH=../../native/lib ./example_mps_file ../../data/model.mps
 */
#include <stdio.h>
#include <stdlib.h>

#include "hprlp_tpu.h"

int main(int argc, char **argv) {
    const char *path = argc > 1 ? argv[1] : "data/model.mps";

    hprlp_model *model = hprlp_create_model_from_mps(path);
    if (!model) {
        fprintf(stderr, "model allocation failed\n");
        return 1;
    }

    hprlp_parameters params;
    hprlp_parameters_default(&params);
    params.stop_tol = 1e-6;

    hprlp_results *res = hprlp_solve(model, &params);
    if (!res) {
        fprintf(stderr, "solve failed: %s\n", hprlp_last_error());
        hprlp_free_model(model);
        return 1;
    }

    printf("status: %s\n", res->status);
    printf("iterations: %lld\n", (long long)res->iter);
    printf("objective: %.6f\n", res->primal_obj);

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
