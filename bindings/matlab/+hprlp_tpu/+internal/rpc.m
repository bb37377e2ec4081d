function result = rpc(req)
% RPC to the Python solver through a WARM request-directory server
% (python -m hprlp_tpu.server --watch DIR): the first call spawns one
% background server for the whole MATLAB/Octave session, every later call
% drops an atomic <id>.req.json and polls for <id>.resp.json — no
% per-call Python+JAX start-up (the round-3 transport spawned a process
% per solve, ~10 s each even warm-cached).  Falls back to the one-shot
% --request/--response transport when the watcher cannot start.
persistent watchDir warmOk
if isempty(warmOk), warmOk = true; end

% Sentinel: rpc('shutdown') stops the warm watcher (hprlp_tpu.shutdown_server).
if ischar(req) && strcmp(req, 'shutdown')
    result = false;
    if ~isempty(watchDir) && isfolder(watchDir)
        fid = fopen(fullfile(watchDir, 'shutdown.tmp'), 'w');
        fwrite(fid, '{}'); fclose(fid);
        movefile(fullfile(watchDir, 'shutdown.tmp'), ...
                 fullfile(watchDir, 'shutdown.req.json'));
        result = true;
    end
    watchDir = [];
    return;
end

python = getenv('HPRLP_TPU_PYTHON');
if isempty(python), python = 'python'; end
root = hprlp_tpu.internal.repoRoot();
pp = getenv('PYTHONPATH');
% Prepend the repo root only once: setenv persists for the whole MATLAB
% session, so unconditional prepending would grow PYTHONPATH per call.
if ~contains([pathsep pp pathsep], [pathsep root pathsep])
    setenv('PYTHONPATH', [root pathsep pp]);
end

if warmOk && ~ispc()
    if isempty(watchDir) || ~isfolder(watchDir)
        watchDir = tempname();
        mkdir(watchDir);
        % Background server; its own exit paths: shutdown.req.json (see
        % shutdown below), the directory vanishing, or 30 min idle.
        cmd = sprintf('%s -m hprlp_tpu.server --watch "%s" >/dev/null 2>&1 &', ...
                      python, watchDir);
        system(cmd);
    end
    rid = sprintf('%d_%d', feature_safe_pid(), round(rand()*1e9));
    reqTmp = fullfile(watchDir, [rid '.tmp']);
    reqFile = fullfile(watchDir, [rid '.req.json']);
    respFile = fullfile(watchDir, [rid '.resp.json']);
    fid = fopen(reqTmp, 'w');
    fwrite(fid, jsonencode(req));
    fclose(fid);
    movefile(reqTmp, reqFile);   % atomic: the server never sees partials
    % First call includes the server's Python+JAX start-up; later calls
    % answer in milliseconds-to-seconds.
    deadline = tic();
    while toc(deadline) < 900
        if isfile(respFile)
            resp = jsondecode(fileread(respFile));
            delete(respFile);
            if ~resp.ok
                error('hprlp_tpu:server', '%s', resp.error);
            end
            result = resp.result;
            return;
        end
        pause(0.05);
    end
    % Watcher never answered (spawn failed / killed): degrade to the
    % one-shot transport for this and all later calls.
    warmOk = false;
    if isfile(reqFile), delete(reqFile); end
end

% ---- one-shot fallback (original transport) ----
reqFile = [tempname() '.json'];
respFile = [tempname() '.json'];
fid = fopen(reqFile, 'w');
fwrite(fid, jsonencode(req));
fclose(fid);
cleanup = onCleanup(@() delete_silent(reqFile, respFile));
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

function p = feature_safe_pid()
% getpid exists in Octave; MATLAB needs feature('getpid').
try
    p = feature('getpid');
catch
    p = getpid();
end
end

function delete_silent(varargin)
for k = 1:numel(varargin)
    if isfile(varargin{k}), delete(varargin{k}); end
end
end
