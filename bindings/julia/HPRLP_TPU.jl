# HPRLP_TPU — Julia wrapper for the TPU-native HPR-LP solver.
#
# Binding-surface parity with the reference Julia package (reference:
# bindings/julia/package/src/HPRLP.jl + interface.jl — Model / Parameters
# / Results / solve / solve_batched / solve_mps), adapted to this
# framework's architecture: the compute engine is a Python/JAX process, so
# the wrapper speaks the hprlp_tpu.server JSON+base64 protocol to ONE warm
# server process (the reference instead ccall's libhprlp.so — same user
# surface, different transport; a warm process pays the JAX start-up once
# per session instead of once per call).
#
# Usage:
#     include("HPRLP_TPU.jl"); using .HPRLP_TPU
#     res = HPRLP_TPU.solve_mps("model.mps"; stop_tol=1e-6)
#
#     A  = [1.0 2.0; 3.0 1.0]
#     m  = HPRLP_TPU.Model(A, [-Inf, -Inf], [10.0, 12.0],
#                          [0.0, 0.0], [Inf, Inf], [-3.0, -5.0])
#     res = HPRLP_TPU.solve(m; stop_tol=1e-6)
#     res.status, res.primal_obj, res.x
#
# JuMP bridge: see HPRLP_TPU_JuMP.jl (include it when JuMP is loaded).

module HPRLP_TPU

export Model, Parameters, Results, BatchedResults,
       solve, solve_mps, solve_batched, shutdown_server

using Base64
using SparseArrays

const REPO_ROOT = normpath(joinpath(@__DIR__, "..", ".."))

# ---------------------------------------------------------------------------
# Public types (parity: reference interface.jl)
# ---------------------------------------------------------------------------

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
    spmv_backend::String = "auto"
end

"""LP model: min c'x s.t. AL <= A x <= AU, l <= x <= u."""
struct Model
    A::SparseMatrixCSC{Float64,Int}
    AL::Vector{Float64}
    AU::Vector{Float64}
    l::Vector{Float64}
    u::Vector{Float64}
    c::Vector{Float64}
    obj_constant::Float64
end

Model(A::AbstractMatrix, AL, AU, l, u, c; obj_constant::Real=0.0) =
    Model(SparseMatrixCSC{Float64,Int}(sparse(A)),
          Vector{Float64}(AL), Vector{Float64}(AU),
          Vector{Float64}(l), Vector{Float64}(u), Vector{Float64}(c),
          Float64(obj_constant))

mutable struct Results
    status::String
    iter::Int
    time::Float64
    primal_obj::Float64
    dual_obj::Float64
    gap::Float64
    residuals::Float64
    iter4::Int; iter6::Int; iter8::Int
    time4::Float64; time6::Float64; time8::Float64
    x::Vector{Float64}
    y::Vector{Float64}
    z::Vector{Float64}
end

mutable struct BatchedResults
    m::Int
    n::Int
    batch::Int
    status::Vector{String}
    iter::Vector{Int}
    residuals::Vector{Float64}
    gap::Vector{Float64}
    primal_obj::Vector{Float64}
    x::Matrix{Float64}   # (n, batch)
    y::Matrix{Float64}   # (m, batch)
    z::Matrix{Float64}
    time::Float64
    setup_time::Float64
    solve_time::Float64
    power_time::Float64
end

# ---------------------------------------------------------------------------
# Server process management
# ---------------------------------------------------------------------------

const _SERVER = Ref{Union{Base.Process,Nothing}}(nothing)
const _PYTHON = Ref{String}(get(ENV, "HPRLP_TPU_PYTHON", "python"))

function _server()::Base.Process
    s = _SERVER[]
    if s !== nothing && process_running(s)
        return s
    end
    env = copy(ENV)
    env["PYTHONPATH"] = REPO_ROOT * ":" * get(env, "PYTHONPATH", "")
    cmd = setenv(`$(_PYTHON[]) -m hprlp_tpu.server`, env)
    # open(cmd, "r+"): a Process that is also an IO (stdin writable,
    # stdout readable) — the canonical bidirectional-pipe pattern.
    s = open(pipeline(cmd, stderr=stderr), "r+")
    _SERVER[] = s
    return s
end

"""Stop the background solver process (started lazily on first solve)."""
function shutdown_server()
    s = _SERVER[]
    s === nothing && return
    try
        write(s, _json(Dict("op" => "shutdown")), "\n")
        flush(s)
    catch
    end
    _SERVER[] = nothing
    nothing
end

function _rpc(req::Dict)
    s = _server()
    write(s, _json(req), "\n")
    flush(s)
    line = readline(s)
    isempty(line) && error("solver server closed the connection")
    resp = _parse_json(line)
    get(resp, "ok", false) ||
        error("hprlp_tpu server: " * string(get(resp, "error", "unknown")))
    return resp["result"]
end

# Minimal JSON emit/parse (no package dependencies).
_json(x::Dict) = "{" * join(["\"$k\":" * _json(v) for (k, v) in x], ",") * "}"
_json(x::AbstractString) = "\"" * replace(x, "\\" => "\\\\", "\"" => "\\\"") * "\""
_json(x::Bool) = x ? "true" : "false"
_json(x::Integer) = string(x)
_json(x::AbstractFloat) = isfinite(x) ? string(x) :
    (x > 0 ? "1e400" : "-1e400")  # JSON has no Inf; server maps overflow
_json(x::AbstractVector) = "[" * join(map(_json, x), ",") * "]"

function _parse_json(s::AbstractString)
    # The server emits flat-ish JSON: objects, strings, numbers, booleans,
    # and arrays of strings/numbers — a small recursive parser covers it.
    pos = Ref(1)
    val = _pj_value(s, pos)
    return val
end

function _pj_ws(s, pos)
    while pos[] <= lastindex(s) && isspace(s[pos[]])
        pos[] = nextind(s, pos[])
    end
end

function _pj_value(s, pos)
    _pj_ws(s, pos)
    c = s[pos[]]
    c == '{' && return _pj_object(s, pos)
    c == '[' && return _pj_array(s, pos)
    c == '"' && return _pj_string(s, pos)
    if startswith(SubString(s, pos[]), "true")
        pos[] += 4; return true
    elseif startswith(SubString(s, pos[]), "false")
        pos[] += 5; return false
    elseif startswith(SubString(s, pos[]), "null")
        pos[] += 4; return nothing
    # Defensive: non-standard tokens Python's json module CAN emit for
    # non-finite floats (the server sanitises, but never desynchronise
    # on them).
    elseif startswith(SubString(s, pos[]), "Infinity")
        pos[] += 8; return Inf
    elseif startswith(SubString(s, pos[]), "-Infinity")
        pos[] += 9; return -Inf
    elseif startswith(SubString(s, pos[]), "NaN")
        pos[] += 3; return NaN
    end
    i = pos[]
    j = i
    while j <= lastindex(s) && (s[j] in "+-.eE0123456789")
        j = nextind(s, j)
    end
    num = SubString(s, i, prevind(s, j))
    pos[] = j
    v = tryparse(Int, num)
    return v === nothing ? parse(Float64, num) : v
end

function _pj_object(s, pos)
    d = Dict{String,Any}()
    pos[] += 1  # {
    _pj_ws(s, pos)
    s[pos[]] == '}' && (pos[] += 1; return d)
    while true
        _pj_ws(s, pos)
        k = _pj_string(s, pos)
        _pj_ws(s, pos)
        s[pos[]] == ':' || error("bad json object")
        pos[] += 1
        d[k] = _pj_value(s, pos)
        _pj_ws(s, pos)
        if s[pos[]] == ','
            pos[] += 1
        else
            s[pos[]] == '}' || error("bad json object end")
            pos[] += 1
            return d
        end
    end
end

function _pj_array(s, pos)
    a = Any[]
    pos[] += 1
    _pj_ws(s, pos)
    s[pos[]] == ']' && (pos[] += 1; return a)
    while true
        push!(a, _pj_value(s, pos))
        _pj_ws(s, pos)
        if s[pos[]] == ','
            pos[] += 1
        else
            s[pos[]] == ']' || error("bad json array end")
            pos[] += 1
            return a
        end
    end
end

function _pj_string(s, pos)
    s[pos[]] == '"' || error("expected string")
    io = IOBuffer()
    i = nextind(s, pos[])
    while s[i] != '"'
        if s[i] == '\\'
            i = nextind(s, i)
            c = s[i]
            write(io, c == 'n' ? '\n' : c == 't' ? '\t' : c)
        else
            write(io, s[i])
        end
        i = nextind(s, i)
    end
    pos[] = nextind(s, i)
    return String(take!(io))
end

# ---------------------------------------------------------------------------
# Array transport
# ---------------------------------------------------------------------------

_b64(v::Vector{Float64}) = base64encode(reinterpret(UInt8, v))
_b64(v::Vector{Int64}) = base64encode(reinterpret(UInt8, v))
_b64(M::Matrix{Float64}) = base64encode(reinterpret(UInt8, vec(M)))

_unb64_f64(s::AbstractString) =
    isempty(s) ? Float64[] : collect(reinterpret(Float64, base64decode(s)))
_unb64_i64(s::AbstractString) =
    isempty(s) ? Int64[] : collect(reinterpret(Int64, base64decode(s)))

function _params_dict(p::Parameters)
    Dict{String,Any}(
        "stop_tol" => p.stop_tol, "time_limit" => p.time_limit,
        "max_iter" => p.max_iter, "check_iter" => p.check_iter,
        "use_CR_scaling" => p.use_CR_scaling,
        "use_Ruiz_scaling" => p.use_Ruiz_scaling,
        "use_Pock_Chambolle_scaling" => p.use_Pock_Chambolle_scaling,
        "use_bc_scaling" => p.use_bc_scaling,
        "use_presolve" => p.use_presolve,
        "precision" => p.precision,
        "spmv_backend" => p.spmv_backend)
end

# The server sends non-finite diagnostics (e.g. residuals of an
# INFEASIBLE solve) as +-DBL_MAX — standard JSON has no Infinity token.
_unfin(v) = (v isa AbstractFloat && abs(v) >= 1e307) ? sign(v) * Inf :
    float(v)

function _results(r::Dict)
    Results(r["status"], r["iter"], _unfin(r["time"]),
            _unfin(r["primal_obj"]), _unfin(r["dual_obj"]),
            _unfin(r["gap"]), _unfin(r["residuals"]),
            r["iter4"], r["iter6"], r["iter8"],
            _unfin(r["time4"]), _unfin(r["time6"]), _unfin(r["time8"]),
            _unb64_f64(r["x"]), _unb64_f64(r["y"]), _unb64_f64(r["z"]))
end

# CSR of A from Julia's CSC: CSR(A) == CSC(A') columnwise data.
function _csr(A::SparseMatrixCSC{Float64,Int})
    At = SparseMatrixCSC(A')
    Ap = Vector{Int64}(At.colptr .- 1)
    Ai = Vector{Int64}(At.rowval .- 1)
    Ax = Vector{Float64}(At.nzval)
    return Ap, Ai, Ax
end

# Clamp ±Inf to the solver's numerical infinity for JSON transport.
_finite(v::Vector{Float64}) =
    [isfinite(x) ? x : (x > 0 ? 1e30 : -1e30) for x in v]

# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

"""
    solve(model::Model; kwargs...) -> Results

Solve an LP built from arrays.  Keyword arguments mirror `Parameters`.
"""
function solve(model::Model; kwargs...)
    p = Parameters(; kwargs...)
    Ap, Ai, Ax = _csr(model.A)
    req = Dict{String,Any}(
        "op" => "solve",
        "m" => size(model.A, 1), "n" => size(model.A, 2),
        "Ap" => _b64(Ap), "Ai" => _b64(Ai), "Ax" => _b64(Ax),
        "AL" => _b64(_finite(model.AL)), "AU" => _b64(_finite(model.AU)),
        "l" => _b64(_finite(model.l)), "u" => _b64(_finite(model.u)),
        "c" => _b64(model.c),
        "obj_constant" => model.obj_constant,
        "params" => _params_dict(p))
    return _results(_rpc(req))
end

"""
    solve_mps(path; mps_format="free", kwargs...) -> Results
"""
function solve_mps(path::AbstractString; mps_format::AbstractString="free",
                   kwargs...)
    p = Parameters(; kwargs...)
    req = Dict{String,Any}("op" => "solve_mps", "path" => String(path),
                           "mps_format" => String(mps_format),
                           "params" => _params_dict(p))
    return _results(_rpc(req))
end

"""
    solve_batched(A, C, AL, AU, l, u; obj_constants=nothing, kwargs...)

Solve `size(C, 2)` LPs sharing the sparse matrix `A`.  `C, l, u` are
`(n, B)`; `AL, AU` are `(m, B)` (parity: reference solve_batched,
bindings/julia/package/src/interface.jl:439-479).
"""
function solve_batched(A::AbstractMatrix, C::Matrix{Float64},
                       AL::Matrix{Float64}, AU::Matrix{Float64},
                       l::Matrix{Float64}, u::Matrix{Float64};
                       obj_constants::Union{Vector{Float64},Nothing}=nothing,
                       kwargs...)
    p = Parameters(; kwargs...)
    As = SparseMatrixCSC{Float64,Int}(sparse(A))
    Ap, Ai, Ax = _csr(As)
    m, n = size(As)
    B = size(C, 2)
    fin(M) = map(x -> isfinite(x) ? x : (x > 0 ? 1e30 : -1e30), M)
    req = Dict{String,Any}(
        "op" => "solve_batched",
        "m" => m, "n" => n, "batch" => B,
        "Ap" => _b64(Ap), "Ai" => _b64(Ai), "Ax" => _b64(Ax),
        "C" => _b64(Matrix{Float64}(C)),
        "AL" => _b64(fin(AL)), "AU" => _b64(fin(AU)),
        "l" => _b64(fin(l)), "u" => _b64(fin(u)),
        "obj_constants" => obj_constants === nothing ? "" :
                           _b64(obj_constants),
        "params" => _params_dict(p))
    r = _rpc(req)
    resh(key, rows) = reshape(_unb64_f64(r[key]), rows, B)
    return BatchedResults(
        r["m"], r["n"], r["batch"],
        Vector{String}(r["status"]),
        Vector{Int}(_unb64_i64(r["iter"])),
        _unb64_f64(r["residuals"]), _unb64_f64(r["gap"]),
        _unb64_f64(r["primal_obj"]),
        resh("x", n), resh("y", m), resh("z", n),
        r["time"], r["setup_time"], r["solve_time"], r["power_time"])
end

end # module
