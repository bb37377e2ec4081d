# JuMP bridge for HPRLP_TPU (parity: reference extract_lp_data +
# solve(::JuMP.Model), bindings/julia/package/src/utils.jl:194-279).
#
# Include AFTER both JuMP and HPRLP_TPU are loaded:
#     using JuMP; include("HPRLP_TPU.jl"); using .HPRLP_TPU
#     include("HPRLP_TPU_JuMP.jl"); using .HPRLP_TPU_JuMP
#     res = HPRLP_TPU_JuMP.solve(jump_model; stop_tol=1e-6)

module HPRLP_TPU_JuMP

export extract_lp_data, solve

using JuMP
using SparseArrays
using ..HPRLP_TPU

"""
    extract_lp_data(model::JuMP.Model)
        -> (A, AL, AU, l, u, c, obj_constant)

Extract the affine LP data of a JuMP model in the solver's standard form
min c'x s.t. AL <= A x <= AU, l <= x <= u.  A MAX objective is negated
(the sign is undone on the reported objective by `solve`).  Only affine
constraints/objective are supported (reference: utils.jl:194-269).
"""
function extract_lp_data(model::JuMP.Model)
    vars = all_variables(model)
    n = length(vars)
    vidx = Dict(v => i for (i, v) in enumerate(vars))

    l = fill(-Inf, n)
    u = fill(Inf, n)
    for (i, v) in enumerate(vars)
        has_lower_bound(v) && (l[i] = lower_bound(v))
        has_upper_bound(v) && (u[i] = upper_bound(v))
        if is_fixed(v)
            l[i] = u[i] = fix_value(v)
        end
    end

    obj = objective_function(model)
    c = zeros(n)
    obj_constant = 0.0
    if obj isa AffExpr
        obj_constant = constant(obj)
        for (v, coef) in obj.terms
            c[vidx[v]] += coef
        end
    elseif obj isa VariableRef
        c[vidx[obj]] = 1.0
    elseif !(obj isa Number)
        error("only affine objectives are supported")
    end
    sense = objective_sense(model)
    if sense == MOI.MAX_SENSE
        c .= -c
        obj_constant = -obj_constant
    end

    rows_i = Int[]
    cols_j = Int[]
    vals = Float64[]
    AL = Float64[]
    AU = Float64[]
    row = 0
    for (F, S) in list_of_constraint_types(model)
        F === VariableRef && continue  # variable bounds handled above
        F === AffExpr || error("only affine constraints are supported, " *
                               "got $F-in-$S")
        for con in all_constraints(model, F, S)
            co = constraint_object(con)
            f = co.func::AffExpr
            s = co.set
            row += 1
            lo, hi = if s isa MOI.LessThan
                (-Inf, s.upper)
            elseif s isa MOI.GreaterThan
                (s.lower, Inf)
            elseif s isa MOI.EqualTo
                (s.value, s.value)
            elseif s isa MOI.Interval
                (s.lower, s.upper)
            else
                error("unsupported constraint set $(typeof(s))")
            end
            k = constant(f)
            push!(AL, lo - k)
            push!(AU, hi - k)
            for (v, coef) in f.terms
                push!(rows_i, row)
                push!(cols_j, vidx[v])
                push!(vals, coef)
            end
        end
    end
    A = sparse(rows_i, cols_j, vals, row, n)
    return A, AL, AU, l, u, c, obj_constant, sense
end

"""
    solve(model::JuMP.Model; kwargs...) -> HPRLP_TPU.Results

Solve a JuMP model with the TPU-native HPR-LP solver.  The objective is
reported in the model's original sense.
"""
function solve(model::JuMP.Model; kwargs...)
    A, AL, AU, l, u, c, obj_constant, sense = extract_lp_data(model)
    hm = HPRLP_TPU.Model(A, AL, AU, l, u, c; obj_constant=obj_constant)
    res = HPRLP_TPU.solve(hm; kwargs...)
    if sense == MOI.MAX_SENSE
        res.primal_obj = -res.primal_obj
        res.dual_obj = -res.dual_obj
    end
    return res
end

end # module
