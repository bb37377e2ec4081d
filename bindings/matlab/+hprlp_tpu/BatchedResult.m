classdef BatchedResult
    % Batched solve result (parity: reference +hprlp/BatchedResult.m).
    properties
        m (1,1) double = 0
        n (1,1) double = 0
        batch (1,1) double = 0
        status cell = {}
        iter double = []
        residuals double = []
        gap double = []
        primal_obj double = []
        x double = []   % (n, batch)
        y double = []   % (m, batch)
        z double = []
        time (1,1) double = 0
        setup_time (1,1) double = 0
        solve_time (1,1) double = 0
        power_time (1,1) double = 0
    end
end
