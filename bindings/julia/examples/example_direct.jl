# Direct array API demo (parity: reference bindings/julia/examples —
# every binding solves the same 2x2 LP and checks OPTIMAL/-26.4):
#     min -3x1 - 5x2   s.t.  x1 + 2x2 <= 10,  3x1 + x2 <= 12,  x >= 0
# Run:  julia example_direct.jl     (requires python + hprlp_tpu on
# PYTHONPATH; set HPRLP_TPU_PYTHON to pick an interpreter.)
include(joinpath(@__DIR__, "..", "HPRLP_TPU.jl"))
using .HPRLP_TPU

A = [1.0 2.0; 3.0 1.0]
model = HPRLP_TPU.Model(A, [-Inf, -Inf], [10.0, 12.0],
                        [0.0, 0.0], [Inf, Inf], [-3.0, -5.0])
res = HPRLP_TPU.solve(model; stop_tol=1e-6)
println("status      = ", res.status)
println("objective   = ", res.primal_obj)     # expected ~ -26.4
println("x           = ", res.x)              # expected ~ [2.8, 3.6]
@assert res.status == "OPTIMAL"
@assert abs(res.primal_obj - (-26.4)) < 1e-2
HPRLP_TPU.shutdown_server()
