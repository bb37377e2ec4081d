"""Execute (or at minimum structurally lint) the Julia and MATLAB
wrappers.

Round-2 review finding: ~780 LoC of .jl/.m shipped with nothing
executing them — a syntax error would ship silently.  Two layers here:

  * REAL execution when an interpreter exists: `julia` runs the full
    HPRLP_TPU.jl wrapper against the demo LP (reference acceptance test:
    bindings/julia/examples/example_jump.jl:33-47 — every binding solves
    the same 2x2 LP); `octave` runs the MATLAB `+hprlp_tpu` package the
    same way.  These skip where no interpreter is installed (the CI job
    installs Julia; this dev image has neither).
  * ALWAYS: a block-structure lint in pure Python — comment/string-aware
    keyword/`end` balance per file.  It catches the dominant shipping
    failure (truncated/unbalanced edits), not full syntax.
"""

import os
import re
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JULIA_DIR = os.path.join(REPO, "bindings", "julia")
MATLAB_DIR = os.path.join(REPO, "bindings", "matlab")


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["HPRLP_TPU_PYTHON"] = sys.executable
    env["JAX_PLATFORMS"] = "cpu"
    return env


# ---------------------------------------------------------------------------
# Real execution (gated on interpreter availability)
# ---------------------------------------------------------------------------

JULIA_DEMO = """
include(joinpath({root!r}, "bindings", "julia", "HPRLP_TPU.jl"))
using .HPRLP_TPU
A = [1.0 2.0; 3.0 1.0]
m = HPRLP_TPU.Model(A, [-Inf, -Inf], [10.0, 12.0],
                    [0.0, 0.0], [Inf, Inf], [-3.0, -5.0])
res = HPRLP_TPU.solve(m; stop_tol=1e-6)
@assert res.status == "OPTIMAL" res.status
@assert abs(res.primal_obj - (-26.4)) < 1e-2 res.primal_obj
@assert maximum(abs.(res.x .- [2.8, 3.6])) < 1e-3
HPRLP_TPU.shutdown_server()
println("JULIA_OK")
"""


@pytest.mark.skipif(shutil.which("julia") is None,
                    reason="julia not installed")
def test_julia_wrapper_solves(tmp_path):
    script = tmp_path / "demo.jl"
    script.write_text(JULIA_DEMO.format(root=REPO))
    r = subprocess.run(["julia", str(script)], env=_env(),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "JULIA_OK" in r.stdout


JULIA_PKG_DEMO = """
using Pkg
Pkg.activate(mktempdir())
Pkg.develop(path=joinpath({root!r}, "bindings", "julia", "package"))
using HPRLP_TPU
res = HPRLP_TPU.solve_mps(joinpath({root!r}, "data", "model.mps");
                          stop_tol=1e-6)
@assert res.status == "OPTIMAL" res.status
@assert abs(res.primal_obj - (-26.4)) < 1e-2 res.primal_obj
HPRLP_TPU.shutdown_server()
println("JULIA_PKG_OK")
"""


@pytest.mark.skipif(shutil.which("julia") is None,
                    reason="julia not installed")
def test_julia_package_activates_and_solves(tmp_path):
    """The Pkg-style package (bindings/julia/package — reference parity:
    its Julia wrapper is a real package) develops and loads via `using
    HPRLP_TPU`."""
    script = tmp_path / "pkg_demo.jl"
    script.write_text(JULIA_PKG_DEMO.format(root=REPO))
    env = _env()
    env["JULIA_DEPOT_PATH"] = str(tmp_path / "depot")
    r = subprocess.run(["julia", str(script)], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "JULIA_PKG_OK" in r.stdout


OCTAVE_DEMO = """
addpath({mdir!r});
A = sparse([1.0 2.0; 3.0 1.0]);
model = hprlp_tpu.Model(A, [-Inf; -Inf], [10.0; 12.0], ...
                        [0.0; 0.0], [Inf; Inf], [-3.0; -5.0]);
p = hprlp_tpu.Parameters();
p.stop_tol = 1e-6;
res = model.solve(p);
assert(strcmp(res.status, 'OPTIMAL'));
assert(abs(res.primal_obj - (-26.4)) < 1e-2);
% Warm transport: the SECOND solve reuses the background --watch server,
% so it must not pay a Python+JAX start-up (round-3 weak spot: a full
% process spawn per call, ~10 s even warm-cached).
t0 = tic();
res2 = model.solve(p);
t2 = toc(t0);
assert(strcmp(res2.status, 'OPTIMAL'));
printf('second_solve_seconds %.3f\n', t2);
assert(t2 < 5.0);
info = model.get_model_info();
assert(info.m == 2 && info.n == 2 && info.nnz == 4);
hprlp_tpu.shutdown_server();
disp('OCTAVE_OK');
"""


@pytest.mark.skipif(shutil.which("octave") is None,
                    reason="octave not installed")
def test_octave_matlab_wrapper_solves(tmp_path):
    script = tmp_path / "demo.m"
    script.write_text(OCTAVE_DEMO.format(mdir=MATLAB_DIR))
    r = subprocess.run(
        ["octave", "--no-gui", "--quiet", str(script)], env=_env(),
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OCTAVE_OK" in r.stdout


# ---------------------------------------------------------------------------
# Structural lint (always runs)
# ---------------------------------------------------------------------------

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_!]*")

JULIA_OPENERS = {"function", "macro", "begin", "if", "for", "while",
                 "try", "let", "module", "baremodule", "struct",
                 "quote", "do"}
MATLAB_OPENERS = {"function", "if", "for", "while", "switch", "try",
                  "classdef", "parfor", "methods", "properties",
                  "events", "enumeration", "arguments", "spmd"}


def _strip_julia(text: str) -> str:
    """Replace comments/strings with spaces, preserving other chars."""
    out = []
    i, n = 0, len(text)
    prev_sig = ""  # last significant char (transpose-vs-char heuristic)
    while i < n:
        ch = text[i]
        if ch == "#" and text[i:i + 2] == "#=":
            depth = 1
            i += 2
            while i < n and depth:
                if text[i:i + 2] == "#=":
                    depth += 1
                    i += 2
                elif text[i:i + 2] == "=#":
                    depth -= 1
                    i += 2
                else:
                    out.append("\n" if text[i] == "\n" else " ")
                    i += 1
                    continue
                out.append("  ")
            continue
        if ch == "#":
            while i < n and text[i] != "\n":
                out.append(" ")
                i += 1
            continue
        if text[i:i + 3] == '"""':
            out.append("   ")
            i += 3
            while i < n and text[i:i + 3] != '"""':
                out.append("\n" if text[i] == "\n" else " ")
                i += 1
            out.append("   ")
            i += 3
            prev_sig = '"'
            continue
        if ch == '"' or ch == "`":
            q = ch
            out.append(" ")
            i += 1
            while i < n and text[i] != q:
                if text[i] == "\\":
                    out.append("  ")
                    i += 2
                    continue
                out.append("\n" if text[i] == "\n" else " ")
                i += 1
            out.append(" ")
            i += 1
            prev_sig = q
            continue
        if ch == "'":
            # transpose when following a value; else a char literal
            if prev_sig.isalnum() or prev_sig in "_)]\"'":
                out.append(" ")
                i += 1
                continue
            out.append(" ")
            i += 1
            while i < n and text[i] != "'":
                if text[i] == "\\":
                    out.append("  ")
                    i += 2
                    continue
                out.append(" ")
                i += 1
            out.append(" ")
            i += 1
            prev_sig = "'"
            continue
        out.append(ch)
        if not ch.isspace():
            prev_sig = ch
        i += 1
    return "".join(out)


def _strip_matlab(text: str) -> str:
    out = []
    i, n = 0, len(text)
    prev_sig = ""
    while i < n:
        ch = text[i]
        if ch == "%":
            # %{ ... %} block comments occupy their own lines
            if text[i:i + 2] == "%{":
                while i < n and text[i:i + 2] != "%}":
                    out.append("\n" if text[i] == "\n" else " ")
                    i += 1
                out.append("  ")
                i += 2
                continue
            while i < n and text[i] != "\n":
                out.append(" ")
                i += 1
            continue
        if ch == '"':
            out.append(" ")
            i += 1
            while i < n and text[i] != '"':
                out.append(" ")
                i += 1
            out.append(" ")
            i += 1
            prev_sig = '"'
            continue
        if ch == "'":
            if prev_sig.isalnum() or prev_sig in "_)]}.'":
                out.append(" ")  # transpose
                i += 1
                continue
            out.append(" ")
            i += 1
            while i < n:
                if text[i] == "'":
                    if text[i:i + 2] == "''":  # escaped quote
                        out.append("  ")
                        i += 2
                        continue
                    break
                out.append(" ")
                i += 1
            out.append(" ")
            i += 1
            prev_sig = "'"
            continue
        out.append(ch)
        if not ch.isspace():
            prev_sig = ch
        i += 1
    return "".join(out)


def _block_balance(stripped: str, openers, path: str) -> None:
    """Assert opener/`end` balance, ignoring `end` inside brackets
    (array indexing) and keyword-lookalike identifiers (word-bounded
    regex).  `mutable`/`abstract type`/`primitive type` never appear in
    these wrappers, and `do` blocks do not either — the opener sets
    above cover what the files use; an unknown opener keyword would
    surface as an end-surplus failure here, which is the point."""
    depth_br = 0
    balance = 0
    line = 1
    pos = 0
    for m in re.finditer(r"[\[\](){}\n]|" + _WORD.pattern, stripped):
        tok = m.group(0)
        if tok == "\n":
            line += 1
            continue
        if tok in "[({":
            depth_br += 1
            continue
        if tok in "])}":
            depth_br = max(0, depth_br - 1)
            continue
        if depth_br > 0:
            continue  # `end` (or keywords) inside indexing/args
        if tok == "end":
            balance -= 1
            assert balance >= 0, (
                f"{path}:{line}: surplus 'end' (block lint)")
        elif tok in openers:
            balance += 1
        pos = m.end()
    assert balance == 0, (
        f"{path}: {balance} unclosed block(s) at EOF (block lint)")
    del pos


def _jl_files():
    out = []
    for root, _dirs, files in os.walk(JULIA_DIR):
        out.extend(os.path.join(root, f) for f in files
                   if f.endswith(".jl"))
    return sorted(out)


def _m_files():
    out = []
    for root, _dirs, files in os.walk(MATLAB_DIR):
        out.extend(os.path.join(root, f) for f in files
                   if f.endswith(".m"))
    return sorted(out)


@pytest.mark.parametrize("path", _jl_files())
def test_julia_block_balance(path):
    with open(path) as f:
        stripped = _strip_julia(f.read())
    _block_balance(stripped, JULIA_OPENERS, path)
    # The module must export the acceptance-test surface.
    text = open(path).read()
    if (os.path.basename(path) == "HPRLP_TPU.jl"
            and "include(" not in text):  # the Pkg entry is a shim that
        # includes the real module file — lint the surface there only.
        for name in ("Model", "Parameters", "solve", "solve_mps",
                     "solve_batched"):
            assert re.search(rf"\b{name}\b", text), name


@pytest.mark.parametrize("path", _m_files())
def test_matlab_block_balance(path):
    with open(path) as f:
        stripped = _strip_matlab(f.read())
    _block_balance(stripped, MATLAB_OPENERS, path)


def test_lint_catches_unbalance():
    """The lint itself must fail on a truncated block (meta-test)."""
    with pytest.raises(AssertionError):
        _block_balance(_strip_julia("function f(x)\n  x + 1\n"),
                       JULIA_OPENERS, "<synthetic>")
    with pytest.raises(AssertionError):
        _block_balance(_strip_matlab("if x\nend\nend\n"),
                       MATLAB_OPENERS, "<synthetic>")
    # ...and pass on correct code with `end`-indexing and strings.
    _block_balance(_strip_julia(
        'function f(x)\n  y = x[end]  # "if" in comment\n'
        '  s = "while "\n  return y\nend\n'), JULIA_OPENERS, "<ok>")
    _block_balance(_strip_matlab(
        "function y = f(x)\n% for comment\ny = x(end)';\n"
        "s = 'if you must';\nend\n"), MATLAB_OPENERS, "<ok>")
