# JuMP bridge demo (parity: reference bindings/julia/examples/
# example_jump.jl:33-47).  Requires the JuMP package.
# Run:  julia --project example_jump.jl
include(joinpath(@__DIR__, "..", "HPRLP_TPU.jl"))
include(joinpath(@__DIR__, "..", "HPRLP_TPU_JuMP.jl"))
using .HPRLP_TPU, .HPRLP_TPU_JuMP
using JuMP

model = JuMP.Model()
@variable(model, x1 >= 0)
@variable(model, x2 >= 0)
@objective(model, Max, 3x1 + 5x2)           # MAX sense is negated in the bridge
@constraint(model, x1 + 2x2 <= 10)
@constraint(model, 3x1 + x2 <= 12)

res = HPRLP_TPU_JuMP.solve(model; stop_tol=1e-6)
println("status    = ", res.status)
println("objective = ", res.primal_obj)      # expected ~ 26.4 (max sense)
HPRLP_TPU.shutdown_server()
