"""Direct array API example (parity: reference examples/c/example_direct_lp.c).

Solves the repo-wide 2x2 ground-truth LP:
    min -3 x1 - 5 x2   s.t.  x1 + 2 x2 <= 10,  3 x1 + x2 <= 12,  x >= 0
Optimum: x = (2.8, 3.6), obj = -26.4.
"""

import numpy as np

import hprlp_tpu as hp


def main():
    A = np.array([[1.0, 2.0], [3.0, 1.0]])
    AL = np.array([-np.inf, -np.inf])
    AU = np.array([10.0, 12.0])
    l = np.array([0.0, 0.0])
    u = np.array([np.inf, np.inf])
    c = np.array([-3.0, -5.0])

    res = hp.solve(A, AL, AU, l, u, c, hp.Parameters(stop_tol=1e-6))
    print(f"\nstatus   = {res.status}")
    print(f"objective = {res.primal_obj:.6f}  (expected -26.4)")
    print(f"x         = {np.round(res.x, 4)}  (expected [2.8 3.6])")
    assert res.status == "OPTIMAL"


if __name__ == "__main__":
    main()
