function v = b64ToI64(s)
if isempty(s), v = []; return; end
v = typecast(uint8(matlab.net.base64decode(s)), 'int64');
v = v(:);
end
