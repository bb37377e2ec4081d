function v = b64ToF64(s)
if isempty(s), v = []; return; end
v = typecast(uint8(matlab.net.base64decode(s)), 'double');
v = v(:);
end
