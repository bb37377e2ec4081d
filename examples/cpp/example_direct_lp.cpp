/* C++ ABI demo: solve the 2x2 ground-truth LP directly from arrays
 * (parity: reference examples/cpp/example_direct_lp.cpp — same LP, same
 * expected optimum obj = -26.4, x = (2.8, 3.6)).
 *
 * Build: `make` in this directory (after `make` in native/).
 */
#include <cmath>
#include <cstdio>
#include <iomanip>
#include <iostream>

#include "hprlp_tpu.h"

int main() {
    std::cout << "hprlp_tpu C++ example (v" << HPRLP_TPU_VERSION << ")\n"
              << "min -3 x1 - 5 x2  s.t.  x1 + 2 x2 <= 10, "
                 "3 x1 + x2 <= 12, x >= 0\n";

    /* CSR of A (2x2 constraints over 2 variables). */
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
        std::cerr << "model allocation failed\n";
        return 1;
    }

    hprlp_parameters params;
    hprlp_parameters_default(&params);
    params.stop_tol = 1e-6;
    std::snprintf(params.precision, sizeof(params.precision), "f64");

    hprlp_results *res = hprlp_solve(model, &params);
    if (!res) {
        std::cerr << "solve failed: " << hprlp_last_error() << "\n";
        hprlp_free_model(model);
        return 1;
    }

    std::cout << "status: " << res->status << "\n"
              << "iterations: " << res->iter << "\n"
              << std::fixed << std::setprecision(6)
              << "objective: " << res->primal_obj << "\n";
    if (res->n >= 2)
        std::cout << std::setprecision(4) << "x = (" << res->x[0] << ", "
                  << res->x[1] << ")\n";

    const bool ok = res->primal_obj < -26.3 && res->primal_obj > -26.5;
    hprlp_free_results(res);
    hprlp_free_model(model);
    hprlp_shutdown();
    if (!ok) {
        std::cerr << "objective mismatch\n";
        return 1;
    }
    std::cout << "OK\n";
    return 0;
}
