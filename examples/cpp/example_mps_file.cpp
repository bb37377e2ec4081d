/* C++ ABI demo: solve data/model.mps through the native MPS path
 * (parity: reference examples/cpp/example_mps_file.cpp).
 *
 * Build: `make` in this directory.  Usage: ./example_mps_file [file.mps]
 */
#include <iostream>

#include "hprlp_tpu.h"

int main(int argc, char **argv) {
    const char *path = argc > 1 ? argv[1] : "../../data/model.mps";
    std::cout << "hprlp_tpu C++ MPS example: " << path << "\n";

    hprlp_model *model = hprlp_create_model_from_mps(path);
    if (!model) {
        std::cerr << "failed to read " << path << ": "
                  << hprlp_last_error() << "\n";
        return 1;
    }

    hprlp_parameters params;
    hprlp_parameters_default(&params);
    params.stop_tol = 1e-6;

    hprlp_results *res = hprlp_solve(model, &params);
    if (!res) {
        std::cerr << "solve failed: " << hprlp_last_error() << "\n";
        hprlp_free_model(model);
        return 1;
    }

    std::cout << "status: " << res->status
              << "  iter: " << res->iter
              << "  obj: " << res->primal_obj << "\n";
    const bool ok = std::string(res->status) == "OPTIMAL";
    hprlp_free_results(res);
    hprlp_free_model(model);
    hprlp_shutdown();
    std::cout << (ok ? "OK\n" : "NOT OPTIMAL\n");
    return ok ? 0 : 1;
}
