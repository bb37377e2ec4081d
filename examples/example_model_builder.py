"""Algebraic modeling example (parity: reference bindings/python examples
using ModelBuilder / operator overloading)."""

import hprlp_tpu as hp


def main():
    m = hp.ModelBuilder("maximize", name="production")
    x = m.add_variable(name="widgets")
    y = m.add_variable(name="gadgets")
    m.set_objective(3 * x + 5 * y)
    m.add_constraint(x + 2 * y <= 10, name="assembly")
    m.add_constraint(3 * x + y <= 12, name="paint")
    m.add_constraint(hp.between(0, x - y, 8), name="balance")

    res = m.solve(hp.Parameters(verbose=False))
    print(f"status    = {res.status}")
    print(f"objective = {res.primal_obj:.4f}")
    print(f"widgets   = {x.value:.4f}")
    print(f"gadgets   = {y.value:.4f}")
    assert res.status == "OPTIMAL"


if __name__ == "__main__":
    main()
