"""Batched shared-A example (parity: reference examples/c/example_batched_lp.c):
many scenario LPs sharing one constraint matrix, solved together with
per-member restart/sigma state."""

import numpy as np

import hprlp_tpu as hp


def main():
    rng = np.random.default_rng(0)
    A = np.array([[1.0, 2.0], [3.0, 1.0]])
    B = 16

    # Scenarios: random scaling of the demo objective and capacities.
    obj_scale = rng.uniform(0.5, 2.0, B)
    cap_scale = rng.uniform(0.8, 1.2, B)
    C = np.outer([-3.0, -5.0], obj_scale)
    AL = np.full((2, B), -np.inf)
    AU = np.outer([10.0, 12.0], cap_scale)
    l = np.zeros((2, B))
    u = np.full((2, B), np.inf)

    out = hp.solve_batched(A, C, AL, AU, l, u,
                           params=hp.Parameters(verbose=False))
    print(f"batch size     = {out.batch_size}")
    print(f"statuses       = {sorted(set(out.status))}")
    print(f"objectives[:4] = {np.round(out.primal_obj[:4], 3)}")
    assert all(s == "OPTIMAL" for s in out.status)


if __name__ == "__main__":
    main()
