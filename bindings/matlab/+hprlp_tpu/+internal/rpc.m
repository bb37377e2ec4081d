function result = rpc(req)
% RPC one-shot request to the Python solver via temp files
% (python -m hprlp_tpu.server --request --response).  MATLAB cannot keep
% a bidirectional pipe conveniently, so each call pays one process spawn;
% the JAX compile cache keeps warm-ish latencies after the first call.
reqFile = [tempname() '.json'];
respFile = [tempname() '.json'];
fid = fopen(reqFile, 'w');
fwrite(fid, jsonencode(req));
fclose(fid);
cleanup = onCleanup(@() delete_silent(reqFile, respFile));

python = getenv('HPRLP_TPU_PYTHON');
if isempty(python), python = 'python'; end
root = hprlp_tpu.internal.repoRoot();
pp = getenv('PYTHONPATH');
% Prepend the repo root only once: setenv persists for the whole MATLAB
% session, so unconditional prepending would grow PYTHONPATH per call.
if ~contains([pathsep pp pathsep], [pathsep root pathsep])
    setenv('PYTHONPATH', [root pathsep pp]);
end
cmd = sprintf('%s -m hprlp_tpu.server --request "%s" --response "%s"', ...
              python, reqFile, respFile);
status = system(cmd);
if status ~= 0 || ~isfile(respFile)
    error('hprlp_tpu:server', 'solver process failed (exit %d)', status);
end
resp = jsondecode(fileread(respFile));
if ~resp.ok
    error('hprlp_tpu:server', '%s', resp.error);
end
result = resp.result;
end

function delete_silent(varargin)
for k = 1:numel(varargin)
    if isfile(varargin{k}), delete(varargin{k}); end
end
end
