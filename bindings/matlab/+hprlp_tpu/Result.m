classdef Result
    % Solve result (parity: reference +hprlp/Result.m).
    properties
        status (1,:) char = 'ERROR'
        iter (1,1) double = 0
        time (1,1) double = 0
        primal_obj (1,1) double = 0
        dual_obj (1,1) double = 0
        gap (1,1) double = Inf
        residuals (1,1) double = Inf
        iter4 (1,1) double = 0
        iter6 (1,1) double = 0
        iter8 (1,1) double = 0
        time4 (1,1) double = 0
        time6 (1,1) double = 0
        time8 (1,1) double = 0
        x double = []
        y double = []
        z double = []
    end
    methods
        function obj = Result(r)
            % Construct from the decoded server response struct.
            if nargin == 0, return; end
            obj.status = char(r.status);
            % Non-finite diagnostics travel as +-DBL_MAX (standard JSON
            % has no Infinity token); map them back.
            obj.iter = r.iter; obj.time = unfin(r.time);
            obj.primal_obj = unfin(r.primal_obj);
            obj.dual_obj = unfin(r.dual_obj);
            obj.gap = unfin(r.gap); obj.residuals = unfin(r.residuals);
            obj.iter4 = r.iter4; obj.iter6 = r.iter6; obj.iter8 = r.iter8;
            obj.time4 = unfin(r.time4); obj.time6 = unfin(r.time6);
            obj.time8 = unfin(r.time8);
            obj.x = hprlp_tpu.internal.b64ToF64(r.x);
            obj.y = hprlp_tpu.internal.b64ToF64(r.y);
            obj.z = hprlp_tpu.internal.b64ToF64(r.z);
        end
    end
end

function v = unfin(v)
if abs(v) >= 1e307, v = sign(v) * Inf; end
end
