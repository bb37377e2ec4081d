classdef Model
    % LP model:  min c'x  s.t.  AL <= A x <= AU,  l <= x <= u
    % (parity: reference bindings/matlab/+hprlp/Model.m — arrays or MPS;
    % solves run in a Python/JAX worker via hprlp_tpu.server).
    properties
        A            % sparse or dense (m x n)
        AL double
        AU double
        l double
        u double
        c double
        obj_constant (1,1) double = 0
    end
    methods
        function obj = Model(A, AL, AU, l, u, c, obj_constant)
            obj.A = A;
            obj.AL = AL(:); obj.AU = AU(:);
            obj.l = l(:); obj.u = u(:); obj.c = c(:);
            if nargin > 6, obj.obj_constant = obj_constant; end
        end
        function res = solve(obj, params)
            if nargin < 2, params = hprlp_tpu.Parameters(); end
            % MATLAB sparse is CSC; CSR(A) = CSC(A') column-wise.
            At = sparse(obj.A)';
            [ri, ci, vv] = find(At);             %#ok<ASGLU>
            [mm, nn] = size(obj.A);
            % Column pointers of At = row pointers of A (0-based).
            Ap = int64([0; cumsum(full(sum(At ~= 0, 1)))']);
            % Row indices within each column of At, in column order.
            [~, order] = sortrows([ci, ri]);
            Ai = int64(ri(order) - 1);
            Ax = vv(order);
            req = struct('op', 'solve', 'm', mm, 'n', nn, ...
                'Ap', hprlp_tpu.internal.i64ToB64(Ap), ...
                'Ai', hprlp_tpu.internal.i64ToB64(Ai), ...
                'Ax', hprlp_tpu.internal.f64ToB64(Ax), ...
                'AL', hprlp_tpu.internal.f64ToB64(hprlp_tpu.internal.clampInf(obj.AL)), ...
                'AU', hprlp_tpu.internal.f64ToB64(hprlp_tpu.internal.clampInf(obj.AU)), ...
                'l', hprlp_tpu.internal.f64ToB64(hprlp_tpu.internal.clampInf(obj.l)), ...
                'u', hprlp_tpu.internal.f64ToB64(hprlp_tpu.internal.clampInf(obj.u)), ...
                'c', hprlp_tpu.internal.f64ToB64(obj.c), ...
                'obj_constant', obj.obj_constant, ...
                'params', params.toStruct());
            r = hprlp_tpu.internal.rpc(req);
            res = hprlp_tpu.Result(r);
        end
        function info = get_model_info(obj)
            % Model dimensions (parity: the reference MEX command
            % get_model_info, hprlp_mex.cpp:553-582 — m/n/obj_constant —
            % plus nnz; computed locally, the model data lives here).
            [mm, nn] = size(obj.A);
            info = struct('m', mm, 'n', nn, ...
                          'nnz', nnz(sparse(obj.A)), ...
                          'obj_constant', obj.obj_constant);
        end
    end
    methods (Static)
        function obj = fromMps(path)
            % Placeholder model; solve_mps drives the reader server-side.
            error('hprlp_tpu:fromMps', ...
                  'use hprlp_tpu.solve_mps(path, params) directly');
        end
    end
end
