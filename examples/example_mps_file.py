"""MPS file example (parity: reference examples/c/example_mps_file.c +
data/model.mps)."""

import os

import hprlp_tpu as hp

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    path = os.path.join(HERE, os.pardir, "data", "model.mps")
    res = hp.solve_mps(path, hp.Parameters(verbose=False))
    print(f"status    = {res.status}")
    print(f"objective = {res.primal_obj:.4f}  (expected -26.4)")
    assert res.status == "OPTIMAL"


if __name__ == "__main__":
    main()
