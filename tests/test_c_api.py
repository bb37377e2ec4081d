"""C ABI tests: compile and run the C example against libhprlp_tpu.so
(the pipe-transport C API, native/src/hprlp_c_api.cpp), and drive the
library from Python via ctypes as a second consumer."""

import ctypes as ct
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "lib", "libhprlp_tpu.so")

pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="libhprlp_tpu.so not built")


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["HPRLP_TPU_PYTHON"] = sys.executable
    env["HPRLP_TPU_ROOT"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_c_example_compiles_and_solves(tmp_path):
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no C compiler")
    src = os.path.join(REPO, "examples", "c", "example_direct_lp.c")
    exe = str(tmp_path / "example")
    subprocess.run(
        [cc, src, "-I" + os.path.join(REPO, "native", "include"),
         "-L" + os.path.join(REPO, "native", "lib"), "-lhprlp_tpu",
         "-o", exe], check=True)
    env = _env()
    env["LD_LIBRARY_PATH"] = os.path.join(REPO, "native", "lib")
    r = subprocess.run([exe], env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "status: OPTIMAL" in r.stdout
    assert "OK" in r.stdout


class _Params(ct.Structure):
    _fields_ = [("stop_tol", ct.c_double), ("time_limit", ct.c_double),
                ("max_iter", ct.c_int64), ("check_iter", ct.c_int),
                ("use_CR_scaling", ct.c_int), ("use_Ruiz_scaling", ct.c_int),
                ("use_Pock_Chambolle_scaling", ct.c_int),
                ("use_bc_scaling", ct.c_int), ("use_presolve", ct.c_int),
                ("precision", ct.c_char * 8)]


class _Results(ct.Structure):
    _fields_ = [("status", ct.c_char * 16), ("iter", ct.c_int64),
                ("time", ct.c_double), ("primal_obj", ct.c_double),
                ("dual_obj", ct.c_double), ("gap", ct.c_double),
                ("residuals", ct.c_double),
                ("iter4", ct.c_int64), ("iter6", ct.c_int64),
                ("iter8", ct.c_int64),
                ("time4", ct.c_double), ("time6", ct.c_double),
                ("time8", ct.c_double),
                ("n", ct.c_int64), ("m", ct.c_int64),
                ("x", ct.POINTER(ct.c_double)),
                ("y", ct.POINTER(ct.c_double)),
                ("z", ct.POINTER(ct.c_double))]


def test_ctypes_consumer_mps():
    # The C ABI worker inherits this process's environment; force the
    # CPU backend (the tests must not grab the TPU).
    os.environ.setdefault("HPRLP_TPU_PYTHON", sys.executable)
    os.environ["HPRLP_TPU_ROOT"] = REPO
    os.environ["JAX_PLATFORMS"] = "cpu" 
    lib = ct.CDLL(LIB)
    lib.hprlp_parameters_default.argtypes = [ct.POINTER(_Params)]
    lib.hprlp_create_model_from_mps.restype = ct.c_void_p
    lib.hprlp_create_model_from_mps.argtypes = [ct.c_char_p]
    lib.hprlp_solve.restype = ct.POINTER(_Results)
    lib.hprlp_solve.argtypes = [ct.c_void_p, ct.POINTER(_Params)]
    lib.hprlp_free_results.argtypes = [ct.POINTER(_Results)]
    lib.hprlp_free_model.argtypes = [ct.c_void_p]

    p = _Params()
    lib.hprlp_parameters_default(ct.byref(p))
    p.stop_tol = 1e-6
    p.precision = b"f64"
    model = lib.hprlp_create_model_from_mps(
        os.path.join(REPO, "data", "model.mps").encode())
    res = lib.hprlp_solve(model, ct.byref(p))
    assert res
    r = res.contents
    assert r.status == b"OPTIMAL", (r.status,
                                    lib.hprlp_last_error and "")
    assert abs(r.primal_obj - (-26.4)) < 1e-2
    x = np.ctypeslib.as_array(r.x, shape=(r.n,)).copy()
    np.testing.assert_allclose(x, [2.8, 3.6], atol=1e-3)
    lib.hprlp_free_results(res)
    lib.hprlp_free_model(model)
    lib.hprlp_shutdown()
