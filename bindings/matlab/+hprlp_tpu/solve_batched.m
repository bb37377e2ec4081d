function out = solve_batched(A, C, AL, AU, l, u, params)
% SOLVE_BATCHED solve B LPs sharing the sparse matrix A.
%   C, l, u: (n, B); AL, AU: (m, B).
%   (parity: reference +hprlp/solve_batched.m / batched_solver.cu)
if nargin < 7, params = hprlp_tpu.Parameters(); end
At = sparse(A)';
[ri, ci, vv] = find(At);
[mm, nn] = size(A);
B = size(C, 2);
Ap = int64([0; cumsum(full(sum(At ~= 0, 1)))']);
[~, order] = sortrows([ci, ri]);
Ai = int64(ri(order) - 1);
Ax = vv(order);
ci_ = @(M) hprlp_tpu.internal.f64ToB64(hprlp_tpu.internal.clampInf(M(:)));
req = struct('op', 'solve_batched', 'm', mm, 'n', nn, 'batch', B, ...
    'Ap', hprlp_tpu.internal.i64ToB64(Ap), ...
    'Ai', hprlp_tpu.internal.i64ToB64(Ai), ...
    'Ax', hprlp_tpu.internal.f64ToB64(Ax), ...
    'C', hprlp_tpu.internal.f64ToB64(C(:)), ...
    'AL', ci_(AL), 'AU', ci_(AU), 'l', ci_(l), 'u', ci_(u), ...
    'obj_constants', '', 'params', params.toStruct());
r = hprlp_tpu.internal.rpc(req);
out = hprlp_tpu.BatchedResult();
out.m = r.m; out.n = r.n; out.batch = r.batch;
out.status = cellstr(string(r.status));
out.iter = double(hprlp_tpu.internal.b64ToI64(r.iter));
out.residuals = hprlp_tpu.internal.b64ToF64(r.residuals);
out.gap = hprlp_tpu.internal.b64ToF64(r.gap);
out.primal_obj = hprlp_tpu.internal.b64ToF64(r.primal_obj);
out.x = reshape(hprlp_tpu.internal.b64ToF64(r.x), nn, B);
out.y = reshape(hprlp_tpu.internal.b64ToF64(r.y), mm, B);
out.z = reshape(hprlp_tpu.internal.b64ToF64(r.z), nn, B);
out.time = r.time; out.setup_time = r.setup_time;
out.solve_time = r.solve_time; out.power_time = r.power_time;
end
