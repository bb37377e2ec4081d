# HPRLP_TPU — Julia wrapper for the TPU-native HPR-LP solver.
#
# Binding-surface parity with the reference Julia package (reference:
# bindings/julia/package/src/HPRLP.jl — Parameters / Results / solve),
# adapted to this framework's architecture: the compute engine is a
# Python/JAX process, so the wrapper drives the CLI over an MPS file and
# parses the plain-text solution format (the reference instead ccall's
# libhprlp.so — same user surface, different transport).
#
# Usage:
#     include("HPRLP_TPU.jl"); using .HPRLP_TPU
#     res = HPRLP_TPU.solve_mps("model.mps"; stop_tol=1e-6)
#     res.status, res.primal_obj, res.x

module HPRLP_TPU

export Parameters, Results, solve_mps

const REPO_ROOT = normpath(joinpath(@__DIR__, "..", ".."))

Base.@kwdef struct Parameters
    stop_tol::Float64 = 1e-4
    time_limit::Float64 = 3600.0
    max_iter::Int = 2^31 - 1
    check_iter::Int = 150
    use_CR_scaling::Bool = true
    use_Ruiz_scaling::Bool = true
    use_Pock_Chambolle_scaling::Bool = true
    use_bc_scaling::Bool = true
    use_presolve::Bool = true
    precision::String = "auto"
end

mutable struct Results
    status::String
    iter::Int
    time::Float64
    primal_obj::Float64
    dual_obj::Float64
    gap::Float64
    residuals::Float64
    x::Vector{Float64}
    y::Vector{Float64}
    z::Vector{Float64}
end

function _parse_solution(path::AbstractString)
    res = Results("ERROR", 0, 0.0, 0.0, 0.0, Inf, Inf,
                  Float64[], Float64[], Float64[])
    open(path, "r") do io
        while !eof(io)
            parts = split(strip(readline(io)))
            isempty(parts) && continue
            key = parts[1]
            if key in ("x", "y", "z")
                n = parse(Int, parts[2])
                v = Vector{Float64}(undef, n)
                for i in 1:n
                    v[i] = parse(Float64, strip(readline(io)))
                end
                setfield!(res, Symbol(key), v)
            elseif key == "status"
                res.status = parts[2]
            elseif key == "iter"
                res.iter = parse(Int, parts[2])
            else
                val = parse(Float64, parts[2])
                key == "time" && (res.time = val)
                key == "primal_obj" && (res.primal_obj = val)
                key == "dual_obj" && (res.dual_obj = val)
                key == "gap" && (res.gap = val)
                key == "residuals" && (res.residuals = val)
            end
        end
    end
    return res
end

"""
    solve_mps(path; python="python", kwargs...) -> Results

Solve the LP in `path` (.mps / .mps.gz).  Keyword arguments mirror
`Parameters` fields.
"""
function solve_mps(path::AbstractString; python::AbstractString="python",
                   kwargs...)
    p = Parameters(; kwargs...)
    sol = tempname() * ".sol"
    b(x) = x ? "true" : "false"
    cmd = Cmd(String[
        python, "-m", "hprlp_tpu.cli", "-i", String(path), "--quiet",
        "--solution-out", sol,
        "--tol", string(p.stop_tol),
        "--time-limit", string(p.time_limit),
        "--max-iter", string(p.max_iter),
        "--check-iter", string(p.check_iter),
        "--cr", b(p.use_CR_scaling),
        "--ruiz", b(p.use_Ruiz_scaling),
        "--pock", b(p.use_Pock_Chambolle_scaling),
        "--bc", b(p.use_bc_scaling),
        "--presolve", b(p.use_presolve),
        "--precision", p.precision,
    ])
    env = copy(ENV)
    env["PYTHONPATH"] = REPO_ROOT * ":" * get(env, "PYTHONPATH", "")
    run(setenv(ignorestatus(cmd), env))
    isfile(sol) || error("solver produced no solution file")
    res = _parse_solution(sol)
    rm(sol; force=true)
    return res
end

end # module
