# Package entry point (role parity: the reference ships a real Julia
# package, bindings/julia/package/Project.toml + src/HPRLP.jl).
#
# The module itself lives two directories up as an include-file wrapper
# (single source of truth; `include("HPRLP_TPU.jl")` without Pkg keeps
# working).  Activating this package makes it loadable the package way:
#
#     using Pkg; Pkg.develop(path="bindings/julia/package")
#     using HPRLP_TPU
#     res = HPRLP_TPU.solve_mps("data/model.mps"; stop_tol=1e-6)
#
# The JuMP bridge stays an opt-in include (bindings/julia/
# HPRLP_TPU_JuMP.jl) so the package does not force a JuMP dependency.
include(joinpath(@__DIR__, "..", "..", "HPRLP_TPU.jl"))
