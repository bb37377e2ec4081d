function v = clampInf(v)
% JSON/base64 transport is binary so Inf survives, but keep parity with
% the solver's numerical-infinity convention for values beyond 1e30.
v = double(v);
v(v > 1e30) = Inf;
v(v < -1e30) = -Inf;
end
