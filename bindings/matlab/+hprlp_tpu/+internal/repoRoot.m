function root = repoRoot()
here = fileparts(fileparts(fileparts(mfilename('fullpath'))));
root = fileparts(fileparts(here));
end
