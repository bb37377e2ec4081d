"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates the GSPMD row-block partition of A/A^T (single-LP path) and the
batch-axis sharding (batched path) produce the same results as
single-device runs.  Real-hardware multi-chip execution is validated by
the driver's dryrun_multichip; these tests pin the numerics.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from hprlp_tpu import Parameters, solve_batched
from hprlp_tpu.ops.device_problem import build_device_problem
from hprlp_tpu.parallel.sharded import make_mesh, shard_problem
from hprlp_tpu.solver.loop import solve_problem
from tests.conftest import random_lp

NDEV = 8

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < NDEV, reason="needs 8 virtual devices")


class TestShardedSingleLp:
    def test_sharded_solve_matches_single_device(self):
        prob = random_lp(21, m=60, n=80, density=0.2)
        p1 = Parameters(verbose=False, stop_tol=1e-6, use_presolve=False)
        r1 = solve_problem(prob, p1)
        p8 = Parameters(verbose=False, stop_tol=1e-6, use_presolve=False,
                        mesh_shape=NDEV)
        r8 = solve_problem(prob, p8)
        assert r1.status == r8.status == "OPTIMAL"
        assert r8.primal_obj == pytest.approx(r1.primal_obj, rel=1e-5,
                                              abs=1e-5)
        np.testing.assert_allclose(r8.x, r1.x, atol=1e-4)

    def test_shard_problem_layout(self):
        prob = random_lp(22, m=40, n=50, density=0.3)
        lp, _ = build_device_problem(prob, row_multiple=8 * NDEV,
                                     vec_multiple=256 * NDEV)
        mesh = make_mesh(NDEV)
        sharded = shard_problem(lp, mesh)
        for b in sharded.A.buckets + sharded.AT.buckets:
            assert b.vals.shape[0] % NDEV == 0
            # Sharded along rows over the mesh.
            assert len(b.vals.sharding.device_set) == NDEV
        # Vectors replicated.
        assert sharded.c.sharding.is_fully_replicated

    def test_indivisible_bucket_raises(self):
        prob = random_lp(23, m=20, n=30)
        lp, _ = build_device_problem(prob)  # default row_multiple=8
        mesh = make_mesh(NDEV)
        # Buckets padded to 8 may not divide 8 evenly in all cases; the
        # guard must catch any mismatch rather than mis-shard.
        try:
            shard_problem(lp, mesh)
        except ValueError as e:
            assert "row_multiple" in str(e)


class TestShardedBatched:
    def test_batched_mesh_matches_single(self):
        rng = np.random.default_rng(9)
        m, n, B = 12, 18, NDEV * 2
        A = sp.random(m, n, density=0.4, random_state=rng,
                      data_rvs=lambda k: rng.normal(size=k)).tocsr()
        x0 = rng.uniform(-1, 1, size=(n, B))
        Ax = A @ x0
        args = (A, rng.normal(size=(n, B)), Ax - 1.0, Ax + 1.0,
                x0 - 2.0, x0 + 2.0)
        r1 = solve_batched(*args, params=Parameters(verbose=False))
        r8 = solve_batched(*args,
                           params=Parameters(verbose=False, mesh_shape=NDEV))
        assert list(r1.status) == list(r8.status)
        np.testing.assert_allclose(r8.primal_obj, r1.primal_obj, rtol=1e-5,
                                   atol=1e-6)

    def test_batched_indivisible_batch_raises(self):
        A = np.eye(2)
        with pytest.raises(ValueError):
            solve_batched(A, np.ones((2, 3)), -np.ones((2, 3)),
                          np.ones((2, 3)), np.zeros((2, 3)),
                          np.ones((2, 3)),
                          params=Parameters(verbose=False, mesh_shape=NDEV))


class TestShardedLane:
    """Shard-aware LaneELL: chunk-partitioned Pallas kernel under
    shard_map + psum (interpret mode on the CPU mesh)."""

    def test_lane_spmv_sharded_matches_dense(self):
        import dataclasses as dc

        from hprlp_tpu.ops.sparse import spmv, with_backend

        prob = random_lp(31, m=96, n=140, density=0.15)
        lp, _ = build_device_problem(prob, row_multiple=8 * NDEV,
                                     vec_multiple=256 * NDEV)
        mesh = make_mesh(NDEV)
        sharded = shard_problem(lp, mesh)
        assert sharded.A.mesh is not None

        A_lane = with_backend(sharded.A, "lane")
        assert A_lane.backend == "lane"
        # Chunk axes (either hybrid tile set) padded to the mesh size
        # and sharded.
        assert (A_lane.lane_idx2 is not None
                or A_lane.thin_idx2 is not None)
        for arr in (A_lane.lane_idx2, A_lane.thin_idx2):
            if arr is not None:
                assert arr.shape[0] % NDEV == 0

        import jax.numpy as jnp
        x = jnp.asarray(np.random.default_rng(0).normal(size=lp.A.ncols),
                        lp.c.dtype)
        y_lane = np.asarray(spmv(A_lane, x))
        y_ref = np.asarray(spmv(lp.A, x))  # unsharded gather backend
        np.testing.assert_allclose(y_lane, y_ref, rtol=2e-5, atol=2e-5)

    def test_sharded_solve_keeps_lane_backend(self):
        prob = random_lp(32, m=60, n=80, density=0.2)
        p1 = Parameters(verbose=False, stop_tol=1e-5, use_presolve=False,
                        precision="f32")
        r1 = solve_problem(prob, p1)
        p8 = Parameters(verbose=False, stop_tol=1e-5, use_presolve=False,
                        mesh_shape=NDEV, spmv_backend="lane",
                        precision="f32")
        r8 = solve_problem(prob, p8)
        assert r8.spmv_backend == "lane"
        assert r1.status == r8.status == "OPTIMAL"
        assert r8.primal_obj == pytest.approx(r1.primal_obj, rel=1e-4,
                                              abs=1e-4)
        np.testing.assert_allclose(r8.x, r1.x, atol=5e-3)


class TestDistributed:
    """Multi-host bring-up helpers (parallel/distributed.py); the
    single-process semantics are exercised here, the multi-process
    branch uses jax.make_array_from_callback with identical sharding
    layouts (validated per-shard below)."""

    def test_global_put_matches_device_put(self):
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hprlp_tpu.parallel.distributed import (global_device_count,
                                                    global_put,
                                                    initialize,
                                                    is_multihost)

        initialize()  # no-op single-process
        assert not is_multihost()
        assert global_device_count() >= NDEV
        mesh = make_mesh(NDEV)
        sh = NamedSharding(mesh, P("d"))
        a = np.arange(NDEV * 16, dtype=np.float32)
        g = global_put(a, sh)
        np.testing.assert_array_equal(np.asarray(g), a)
        assert len(g.sharding.device_set) == NDEV

    def test_make_array_callback_branch(self):
        # Drive the multi-process code path directly (the callback-based
        # constructor works single-process too and must produce the same
        # global array).
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh(NDEV)
        sh = NamedSharding(mesh, P("d", None))
        a = np.random.default_rng(0).normal(size=(NDEV * 8, 16))
        g = jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])
        np.testing.assert_array_equal(np.asarray(g), a)


class TestGiantMesh:
    """Giant lane-first ingest COMPOSED with the mesh (round-4: BASELINE
    config 5 at full scale): host scaling + chunk-sharded tile upload,
    solved under shard_map with psum."""

    def test_giant_mesh_builder_shards_tiles(self):
        from hprlp_tpu.ops.device_problem import build_device_problem_giant

        prob = random_lp(41, m=256, n=640, density=0.08)
        lp, maps, scal, _s = build_device_problem_giant(
            prob, mesh=make_mesh(NDEV))
        assert lp.A.backend == lp.AT.backend == "lane"
        for M in (lp.A, lp.AT):
            assert M.mesh is not None
            have = [t for t in (M.lane_idx2, M.thin_idx2) if t is not None]
            assert have, "no lane tiles attached"
            for t in have:
                assert t.shape[0] % NDEV == 0
                assert len(t.sharding.device_set) == NDEV
        # Vectors and scaling factors replicated over the mesh.
        assert lp.c.sharding.is_fully_replicated
        assert scal.row_norm.sharding.is_fully_replicated
        # Gather buckets are stubs (autotune skips on nnz=0).
        assert lp.A.nnz == 0

    def test_giant_mesh_solve_matches_single(self, monkeypatch):
        from hprlp_tpu.solver import loop as loop_mod

        # Small shapes: the CPU mesh runs the lane kernel in interpret
        # mode, which is ~100x device speed.
        prob = random_lp(42, m=96, n=128, density=0.1)
        p1 = Parameters(verbose=False, stop_tol=1e-4, use_presolve=False)
        r1 = solve_problem(prob, p1)

        monkeypatch.setenv("HPRLP_GIANT_LANE_FIRST_NNZ", "100")
        monkeypatch.setattr(loop_mod, "GIANT_LANE_FIRST_NNZ", 100)
        p8 = Parameters(verbose=False, stop_tol=1e-4, use_presolve=False,
                        mesh_shape=NDEV)
        r8 = solve_problem(prob, p8)
        assert r8.spmv_backend == "lane"
        assert r1.status == r8.status == "OPTIMAL"
        assert r8.primal_obj == pytest.approx(r1.primal_obj, rel=1e-3,
                                              abs=1e-3)
        np.testing.assert_allclose(r8.x, r1.x, atol=2e-2)
