function ok = shutdown_server()
% SHUTDOWN_SERVER Stop the warm background solver (parity with the Julia
% wrapper's shutdown_server).  The next solve starts a fresh one.
ok = hprlp_tpu.internal.rpc('shutdown');
end
