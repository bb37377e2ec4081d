function s = f64ToB64(v)
s = matlab.net.base64encode(typecast(double(v(:)), 'uint8'));
end
