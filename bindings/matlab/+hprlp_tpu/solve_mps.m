function res = solve_mps(path, params, mps_format)
% SOLVE_MPS solve an LP from an .mps/.mps.gz file.
%   res = hprlp_tpu.solve_mps('model.mps')
%   res = hprlp_tpu.solve_mps('model.mps', hprlp_tpu.Parameters, 'fixed')
if nargin < 2 || isempty(params), params = hprlp_tpu.Parameters(); end
if nargin < 3, mps_format = 'free'; end
req = struct('op', 'solve_mps', 'path', char(path), ...
             'mps_format', char(mps_format), 'params', params.toStruct());
r = hprlp_tpu.internal.rpc(req);
res = hprlp_tpu.Result(r);
end
