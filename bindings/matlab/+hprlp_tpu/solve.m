function res = solve(A, AL, AU, l, u, c, params)
% SOLVE one-shot LP solve from arrays (parity: reference +hprlp/solve.m).
%   res = hprlp_tpu.solve(A, AL, AU, l, u, c)
if nargin < 7, params = hprlp_tpu.Parameters(); end
model = hprlp_tpu.Model(A, AL, AU, l, u, c);
res = model.solve(params);
end
