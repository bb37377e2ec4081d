% Direct array API demo (parity: reference bindings/matlab examples —
% the same 2x2 LP every binding solves):
%     min -3x1 - 5x2   s.t.  x1 + 2x2 <= 10,  3x1 + x2 <= 12,  x >= 0
% Run from this directory in MATLAB or Octave:
%     addpath('..'); example_direct
A = sparse([1.0 2.0; 3.0 1.0]);
model = hprlp_tpu.Model(A, [-Inf; -Inf], [10.0; 12.0], ...
                        [0.0; 0.0], [Inf; Inf], [-3.0; -5.0]);
p = hprlp_tpu.Parameters();
p.stop_tol = 1e-6;
res = model.solve(p);
fprintf('status    = %s\n', res.status);
fprintf('objective = %.4f\n', res.primal_obj);   % expected ~ -26.4
assert(strcmp(res.status, 'OPTIMAL'));
assert(abs(res.primal_obj - (-26.4)) < 1e-2);
