"""Solver-server protocol tests: the JSON+base64 transport the Julia and
MATLAB wrappers speak (hprlp_tpu/server.py), exercised end to end
in-process and over a real subprocess pipe."""

import base64
import io
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import scipy.sparse as sp

from hprlp_tpu.server import _enc, handle, serve_stream

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dec(s):
    return np.frombuffer(base64.b64decode(s), dtype="<f8")


def _demo_solve_request(**params):
    A = sp.csr_matrix(np.array([[1.0, 2.0], [3.0, 1.0]]))
    return {
        "op": "solve", "m": 2, "n": 2,
        "Ap": _enc(A.indptr.astype(np.int64)),
        "Ai": _enc(A.indices.astype(np.int64)),
        "Ax": _enc(A.data.astype(np.float64)),
        "AL": _enc(np.array([-1e30, -1e30])),
        "AU": _enc(np.array([10.0, 12.0])),
        "l": _enc(np.zeros(2)),
        "u": _enc(np.array([1e30, 1e30])),
        "c": _enc(np.array([-3.0, -5.0])),
        "obj_constant": 0.0,
        "params": {"precision": "f64", "stop_tol": 1e-6, **params},
    }


class TestHandle:
    def test_ping(self):
        assert handle({"op": "ping"}) == {"ok": True, "result": "pong"}

    def test_unknown_op(self):
        r = handle({"op": "nope"})
        assert not r["ok"]

    def test_solve_arrays(self):
        r = handle(_demo_solve_request())
        assert r["ok"], r
        res = r["result"]
        assert res["status"] == "OPTIMAL"
        assert res["primal_obj"] == pytest.approx(-26.4, abs=1e-2)
        np.testing.assert_allclose(_dec(res["x"]), [2.8, 3.6], atol=1e-3)

    def test_solve_mps(self):
        r = handle({"op": "solve_mps",
                    "path": os.path.join(REPO, "data", "model.mps"),
                    "params": {"precision": "f64"}})
        assert r["ok"], r
        assert r["result"]["status"] == "OPTIMAL"
        assert r["result"]["primal_obj"] == pytest.approx(-26.4, abs=1e-2)

    def test_solve_batched(self):
        rng = np.random.default_rng(0)
        m, n, B = 6, 9, 4
        A = sp.random(m, n, density=0.5, random_state=rng,
                      data_rvs=lambda k: rng.normal(size=k)).tocsr()
        x0 = rng.uniform(-1, 1, (n, B))
        Ax = A @ x0
        req = {
            "op": "solve_batched", "m": m, "n": n, "batch": B,
            "Ap": _enc(A.indptr.astype(np.int64)),
            "Ai": _enc(A.indices.astype(np.int64)),
            "Ax": _enc(A.data.astype(np.float64)),
            "C": _enc(rng.normal(size=(n, B)).ravel(order="F")),
            "AL": _enc((Ax - 1.0).ravel(order="F")),
            "AU": _enc((Ax + 1.0).ravel(order="F")),
            "l": _enc((x0 - 2.0).ravel(order="F")),
            "u": _enc((x0 + 2.0).ravel(order="F")),
            "obj_constants": "",
            "params": {"stop_tol": 1e-4},
        }
        r = handle(req)
        assert r["ok"], r
        out = r["result"]
        assert out["batch"] == B
        assert all(s == "OPTIMAL" for s in out["status"])
        x = _dec(out["x"]).reshape(n, B, order="F")
        assert x.shape == (n, B)

    def test_error_boundary(self):
        r = handle({"op": "solve_mps", "path": "/nonexistent.mps",
                    "params": {}})
        assert not r["ok"]
        assert "error" in r


class TestStream:
    def test_stream_roundtrip(self):
        lines = [json.dumps({"op": "ping"}),
                 "not json at all",
                 json.dumps(_demo_solve_request()),
                 json.dumps({"op": "shutdown"}),
                 json.dumps({"op": "ping"})]  # after shutdown: unserved
        out = io.StringIO()
        serve_stream(io.StringIO("\n".join(lines) + "\n"), out)
        resp = [json.loads(x) for x in out.getvalue().splitlines()]
        assert len(resp) == 4  # ping, bad-json error, solve, shutdown-ack
        assert resp[0] == {"ok": True, "result": "pong"}
        assert not resp[1]["ok"]
        assert resp[2]["ok"] and resp[2]["result"]["status"] == "OPTIMAL"
        assert resp[3] == {"ok": True}


class TestSubprocess:
    """The transport exactly as the wrappers use it."""

    def test_oneshot_files(self, tmp_path):
        req = tmp_path / "req.json"
        resp = tmp_path / "resp.json"
        req.write_text(json.dumps({"op": "ping"}))
        env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
        env.pop("PYTHONSTARTUP", None)
        r = subprocess.run(
            [sys.executable, "-m", "hprlp_tpu.server",
             "--request", str(req), "--response", str(resp)],
            env=env, capture_output=True, timeout=300)
        assert r.returncode == 0, r.stderr.decode()
        assert json.loads(resp.read_text()) == {"ok": True,
                                                "result": "pong"}

    def test_pipe_session(self):
        env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
        p = subprocess.Popen(
            [sys.executable, "-m", "hprlp_tpu.server"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, env=env,
            text=True)
        try:
            p.stdin.write(json.dumps({"op": "ping"}) + "\n")
            p.stdin.flush()
            assert json.loads(p.stdout.readline())["result"] == "pong"
            p.stdin.write(json.dumps(_demo_solve_request()) + "\n")
            p.stdin.flush()
            out = json.loads(p.stdout.readline())
            assert out["ok"] and out["result"]["status"] == "OPTIMAL"
            p.stdin.write(json.dumps({"op": "shutdown"}) + "\n")
            p.stdin.flush()
            assert json.loads(p.stdout.readline()) == {"ok": True}
            p.wait(timeout=60)
        finally:
            if p.poll() is None:
                p.kill()

    def test_pipe_session_verbose_solve(self):
        """A client-supplied {"verbose": true} must NOT corrupt the
        protocol: the server routes all solver prints to stderr, so
        stdout carries only JSON responses (round-2 review finding)."""
        env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
        p = subprocess.Popen(
            [sys.executable, "-m", "hprlp_tpu.server"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, env=env, text=True)
        try:
            p.stdin.write(json.dumps(
                _demo_solve_request(verbose=True)) + "\n")
            p.stdin.flush()
            out = json.loads(p.stdout.readline())
            assert out["ok"] and out["result"]["status"] == "OPTIMAL"
            # A second request on the same pipe still parses (no
            # desynchronisation).
            p.stdin.write(json.dumps({"op": "ping"}) + "\n")
            p.stdin.flush()
            assert json.loads(p.stdout.readline())["result"] == "pong"
            p.stdin.write(json.dumps({"op": "shutdown"}) + "\n")
            p.stdin.flush()
            assert json.loads(p.stdout.readline()) == {"ok": True}
            p.wait(timeout=60)
            # The verbose log actually went somewhere (stderr).
            assert "iter" in p.stderr.read()
        finally:
            if p.poll() is None:
                p.kill()


class TestNonFiniteDiagnostics:
    """Standard-JSON transport of Inf diagnostics (round-2 review: the
    Julia wrapper's parser rejects Python's non-standard Infinity token,
    so INFEASIBLE/UNBOUNDED responses crashed it)."""

    def test_infeasible_solve_response_is_standard_json(self):
        A = sp.csr_matrix(np.array([[1.0, 1.0], [-1.0, -1.0]]))
        req = {
            "op": "solve", "m": 2, "n": 2,
            "Ap": _enc(A.indptr.astype(np.int64)),
            "Ai": _enc(A.indices.astype(np.int64)),
            "Ax": _enc(A.data.astype(np.float64)),
            # x0+x1 >= 4 AND x0+x1 <= 1: infeasible
            "AL": _enc(np.array([4.0, -1.0])),
            "AU": _enc(np.array([1e30, 1e30])),
            "l": _enc(np.zeros(2)), "u": _enc(np.array([1e30, 1e30])),
            "c": _enc(np.array([1.0, 1.0])),
            "params": {"precision": "f64", "time_limit": 60.0},
        }
        r = handle(req)
        assert r["ok"], r
        text = json.dumps(r, allow_nan=False)  # must not need Infinity
        back = json.loads(text)
        res = back["result"]
        assert res["status"] in ("INFEASIBLE", "UNBOUNDED", "ITER_LIMIT",
                                 "TIME_LIMIT", "ERROR")
        for k in ("residuals", "gap", "primal_obj", "dual_obj"):
            v = res[k]
            assert isinstance(v, float)
            assert v == v and abs(v) <= 1.7976931348623157e308

    def test_fin_sentinel_mapping(self):
        from hprlp_tpu.server import _fin
        DM = 1.7976931348623157e308
        assert _fin(float("inf")) == DM
        assert _fin(float("-inf")) == -DM
        assert _fin(float("nan")) == DM
        assert _fin(1.25) == 1.25


def test_watch_dir_transport(tmp_path):
    """The warm MATLAB/Octave transport: a --watch server answers atomic
    <id>.req.json drops with <id>.resp.json and stops on
    shutdown.req.json."""
    import json
    import subprocess
    import sys
    import time

    wdir = tmp_path / "watch"
    wdir.mkdir()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    proc = subprocess.Popen(
        [sys.executable, "-m", "hprlp_tpu.server", "--watch", str(wdir),
         "--idle-timeout", "120"],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        def ask(rid, req):
            tmp = wdir / f"{rid}.tmp"
            tmp.write_text(json.dumps(req))
            tmp.rename(wdir / f"{rid}.req.json")
            resp_p = wdir / f"{rid}.resp.json"
            deadline = time.time() + 90
            while time.time() < deadline:
                if resp_p.exists():
                    out = json.loads(resp_p.read_text())
                    resp_p.unlink()
                    return out
                time.sleep(0.02)
            raise TimeoutError("no response")

        assert ask("a1", {"op": "ping"}) == {"ok": True, "result": "pong"}
        r = ask("a2", {"op": "solve_mps",
                       "path": os.path.join(REPO, "data", "model.mps"),
                       "params": {"stop_tol": 1e-6, "verbose": False}})
        assert r["ok"], r
        assert r["result"]["status"] == "OPTIMAL"
        # Second request on the SAME warm server must be fast (<1 s:
        # no Python/JAX start-up — the round-3 weak spot).
        t0 = time.time()
        assert ask("a3", {"op": "ping"})["ok"]
        assert time.time() - t0 < 1.0
        (wdir / "shutdown.tmp").write_text("{}")
        (wdir / "shutdown.tmp").rename(wdir / "shutdown.req.json")
        proc.wait(timeout=30)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()
