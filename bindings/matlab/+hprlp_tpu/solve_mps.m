function res = solve_mps(path, varargin)
%SOLVE_MPS Solve an LP from an MPS file with the TPU-native HPR-LP solver.
%
%   res = hprlp_tpu.solve_mps('model.mps')
%   res = hprlp_tpu.solve_mps('model.mps', 'stop_tol', 1e-6, ...
%                             'use_presolve', false)
%
% Binding-surface parity with the reference MATLAB package (reference:
% bindings/matlab/+hprlp — Model/Parameters/Result), adapted to this
% framework: the compute engine is a Python/JAX process, so this wrapper
% drives the CLI and parses the plain-text solution format (the reference
% instead MEX-loads libhprlp.so — same user surface, different transport).
%
% Returns a struct with fields: status, iter, time, primal_obj, dual_obj,
% gap, residuals, x, y, z.

opts = struct('stop_tol', 1e-4, 'time_limit', 3600, ...
              'max_iter', 2^31 - 1, 'check_iter', 150, ...
              'use_CR_scaling', true, 'use_Ruiz_scaling', true, ...
              'use_Pock_Chambolle_scaling', true, 'use_bc_scaling', true, ...
              'use_presolve', true, 'precision', 'auto', ...
              'python', 'python');
for k = 1:2:numel(varargin)
    opts.(varargin{k}) = varargin{k + 1};
end

here = fileparts(mfilename('fullpath'));
repo = fullfile(here, '..', '..', '..');
sol = [tempname() '.sol'];
b = @(v) lower(mat2str(logical(v)));

cmd = sprintf(['PYTHONPATH=%s %s -m hprlp_tpu.cli -i "%s" --quiet ' ...
    '--solution-out "%s" --tol %g --time-limit %g --max-iter %d ' ...
    '--check-iter %d --cr %s --ruiz %s --pock %s --bc %s ' ...
    '--presolve %s --precision %s'], ...
    repo, opts.python, path, sol, opts.stop_tol, opts.time_limit, ...
    opts.max_iter, opts.check_iter, b(opts.use_CR_scaling), ...
    b(opts.use_Ruiz_scaling), b(opts.use_Pock_Chambolle_scaling), ...
    b(opts.use_bc_scaling), b(opts.use_presolve), opts.precision);
[rc, out] = system(cmd);  %#ok<ASGLU>
if ~isfile(sol)
    error('hprlp_tpu:solve', 'solver produced no solution file:\n%s', out);
end

res = struct('status', 'ERROR', 'iter', 0, 'time', 0, 'primal_obj', 0, ...
             'dual_obj', 0, 'gap', inf, 'residuals', inf, ...
             'x', [], 'y', [], 'z', []);
fid = fopen(sol, 'r');
cleaner = onCleanup(@() fclose(fid));
while true
    line = fgetl(fid);
    if ~ischar(line), break; end
    parts = strsplit(strtrim(line));
    if isempty(parts{1}), continue; end
    key = parts{1};
    switch key
        case {'x', 'y', 'z'}
            n = str2double(parts{2});
            v = zeros(n, 1);
            for i = 1:n
                v(i) = str2double(fgetl(fid));
            end
            res.(key) = v;
        case 'status'
            res.status = parts{2};
        case 'iter'
            res.iter = str2double(parts{2});
        otherwise
            res.(key) = str2double(parts{2});
    end
end
delete(sol);
end
