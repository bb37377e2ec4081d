function s = i64ToB64(v)
s = matlab.net.base64encode(typecast(int64(v(:)), 'uint8'));
end
