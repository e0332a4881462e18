"""Multi-chip sharded TSDF tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from mq3d_tpu.ops.tsdf import TSDFConfig, TSDFVolume, create_state
from mq3d_tpu.parallel.sharded import integrate_dataset_sharded

CFG = TSDFConfig(
    voxel_size=0.05,
    block_resolution=16,
    block_count=1024,
    grid_dim=16,
    depth_max=4.0,
    trunc_voxel_multiplier=4.0,
    chunk_active_capacity=1024,
    integrate_tile=128,
)


def make_frames(n, h=32, w=40):
    rng = np.random.default_rng(0)
    depth = np.full((n, h, w), 2.0, np.float32)
    depth += rng.uniform(-0.05, 0.05, depth.shape).astype(np.float32)
    K = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 30.0
    K[:, 0, 2] = w / 2.0
    K[:, 1, 2] = h / 2.0
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, 0, 3] = np.linspace(-0.2, 0.2, n)
    valid = np.ones(n, bool)
    return depth, K, T, valid


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.asarray(devs[:8]), axis_names=("data",))


class TestShardedTSDF:
    def test_matches_single_chip(self, mesh8):
        depth, K, T, valid = make_frames(16)

        state_sharded = integrate_dataset_sharded(
            CFG, mesh8, depth, K, T, valid, frames_per_device_chunk=1
        )

        vol = TSDFVolume(CFG)
        vol.integrate(depth[:8], K[:8], T[:8], valid[:8])
        vol.integrate(depth[8:], K[8:], T[8:], valid[8:])
        state_single = vol.state

        assert int(state_sharded.n_active) == int(state_single.n_active)
        n = int(state_single.n_active)
        c1 = np.asarray(state_sharded.block_coords[:n])
        c2 = np.asarray(state_single.block_coords[:n])
        k1, k2 = np.lexsort(c1.T), np.lexsort(c2.T)
        np.testing.assert_array_equal(c1[k1], c2[k2])
        np.testing.assert_array_equal(
            np.asarray(state_sharded.weight[:n])[k1],
            np.asarray(state_single.weight[:n])[k2],
        )
        np.testing.assert_allclose(
            np.asarray(state_sharded.tsdf[:n])[k1],
            np.asarray(state_single.tsdf[:n])[k2],
            atol=1e-5,
        )

    def test_graft_entry(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert int(out.n_active) > 0

    @pytest.mark.slow
    def test_graft_dryrun(self, mesh8):
        # Production-shape (50k-block) dryrun: ~4 min on this host.  The
        # driver exercises the same path directly via __graft_entry__.
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestShardedRaycast:
    def test_matches_single_chip(self, mesh8):
        """Frame-sharded raycast == single-chip render, bit-exact (no
        overflow at these sizes; each pixel's march is independent)."""
        from mq3d_tpu.ops.raycast import raycast_depth_batch
        from mq3d_tpu.parallel.sharded import sharded_raycast_batch

        # Smooth plane (no noise): keeps the edge set sparse so NEITHER
        # path overflows its cap — overflowed pixels keep interpolated
        # depth and the single-chip global cap truncates later frames
        # first, which is exactly the per-device-cap advantage, not a
        # mismatch this test should fail on.
        depth, K, T, valid = make_frames(16)
        depth[:] = 2.0
        state = integrate_dataset_sharded(
            CFG, mesh8, depth, K, T, valid, frames_per_device_chunk=2)
        vol = TSDFVolume(CFG, state)
        assert vol.n_active > 0

        h, w = 48, 64
        Kc = np.tile(np.eye(3, dtype=np.float32), (8, 1, 1))
        Kc[:, 0, 0] = Kc[:, 1, 1] = 45.0
        Kc[:, 0, 2] = w / 2.0
        Kc[:, 1, 2] = h / 2.0
        Tc = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
        Tc[:, 0, 3] = np.linspace(-0.2, 0.2, 8)

        want = raycast_depth_batch(vol, Kc, Tc, w, h)
        got, overflow = sharded_raycast_batch(vol, mesh8, Kc, Tc, w, h)
        assert overflow == 0
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
        assert np.isfinite(got).mean() > 0.3

    def test_rejects_ragged_frames(self, mesh8):
        from mq3d_tpu.parallel.sharded import sharded_raycast_batch

        vol = TSDFVolume(CFG, create_state(CFG))
        K = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
        T = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        with pytest.raises(ValueError):
            sharded_raycast_batch(vol, mesh8, K, T, 32, 32)


class TestShardedConfidence:
    def test_matches_single_device(self, mesh8, tmp_path):
        import numpy as np
        from mq3d_tpu.dataio.data_io import DataIO
        from mq3d_tpu.models.side import Side
        from mq3d_tpu.models.transforms import CoordinateSystem
        from mq3d_tpu.parallel.sharded import sharded_confidence_step
        from mq3d_tpu.recon.confidence import confidence_for_refs
        from mq3d_tpu.testing.synthetic import (
            SyntheticSceneConfig, write_synthetic_project,
        )
        import jax.numpy as jnp

        proj, cfg, _ = write_synthetic_project(
            tmp_path / "p", SyntheticSceneConfig(n_frames=8, sweep=1.0)
        )
        io = DataIO(proj)
        ds = io.depth.load_depth_dataset(Side.LEFT, use_cache=False)
        ds.transforms = ds.transforms.convert_coordinate_system(
            CoordinateSystem.OPEN3D, is_camera=True
        )
        depth, valid = io.depth.load_depth_stack(Side.LEFT, ds)
        K = ds.get_render_intrinsic_matrices().astype(np.float32)
        T_cw = ds.transforms.extrinsics_cw.astype(np.float32)
        T_wc = np.linalg.inv(T_cw).astype(np.float32)
        refs = np.arange(8, dtype=np.int32)

        args = (jnp.asarray(depth), jnp.asarray(K), jnp.asarray(T_cw),
                jnp.asarray(T_wc), jnp.asarray(valid), jnp.asarray(refs))
        single_conf, single_cnt = confidence_for_refs(
            *args, depth_max=4.0, error_threshold=0.05, window=2,
        )
        fn = sharded_confidence_step(mesh8)(4.0, 0.05, 2)
        shard_conf, shard_cnt = fn(*args)

        np.testing.assert_array_equal(np.asarray(shard_cnt), np.asarray(single_cnt))
        np.testing.assert_allclose(
            np.asarray(shard_conf), np.asarray(single_conf), atol=1e-7
        )


class TestBatchedPairICP:
    """registration_icp_batch == per-pair registration_icp, single-chip and
    sharded over the 8-device mesh (the multi-chip path for the O(F^2)
    fragment-pair refinement)."""

    def _make_pairs(self, n_pairs=6, seed=0):
        import numpy as np

        from mq3d_tpu.ops.icp import build_grid_nn

        rng = np.random.default_rng(seed)
        sources, grids, max_corrs, inits = [], [], [], []
        targets = []
        for i in range(n_pairs):
            n = int(rng.integers(400, 900))
            tgt = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
            # known small rigid offset
            ang = rng.uniform(-0.05, 0.05)
            c, s = np.cos(ang), np.sin(ang)
            R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            t = rng.uniform(-0.02, 0.02, 3)
            src = (tgt - t) @ R  # inverse transform
            sources.append(src.astype(np.float32))
            targets.append(tgt)
            grids.append(build_grid_nn(tgt, 0.1))
            max_corrs.append(0.1)
            inits.append(np.eye(4))
        return sources, targets, grids, max_corrs, inits

    def test_matches_per_pair(self):
        import numpy as np

        from mq3d_tpu.ops.icp import (
            ICPConvergenceCriteria,
            registration_icp,
            registration_icp_batch,
        )

        sources, targets, grids, max_corrs, inits = self._make_pairs()
        crit = [ICPConvergenceCriteria(20) for _ in sources]
        batch = registration_icp_batch(sources, grids, max_corrs, inits,
                                       crit)
        for i, (src, tgt) in enumerate(zip(sources, targets)):
            single = registration_icp(src, tgt, max_corrs[i],
                                      init=inits[i], criteria=crit[i],
                                      grid=grids[i])
            np.testing.assert_allclose(
                batch[i].transformation, single.transformation,
                atol=1e-9)
            assert batch[i].n_correspondences == single.n_correspondences
            assert batch[i].fitness > 0.95

    def test_sharded_matches(self, mesh8):
        import numpy as np

        from mq3d_tpu.ops.icp import (
            ICPConvergenceCriteria,
            registration_icp_batch,
        )

        sources, targets, grids, max_corrs, inits = self._make_pairs(
            n_pairs=11)  # not a device multiple: exercises pair padding
        crit = [ICPConvergenceCriteria(20) for _ in sources]
        plain = registration_icp_batch(sources, grids, max_corrs, inits,
                                       crit)
        sharded = registration_icp_batch(sources, grids, max_corrs, inits,
                                         crit, mesh=mesh8, axis="data")
        for a, b in zip(plain, sharded):
            np.testing.assert_allclose(a.transformation, b.transformation,
                                       atol=1e-12)
            assert a.n_correspondences == b.n_correspondences


class TestPartitionedStateTSDF:
    """partition_state=True (sharded voxel tables + psum_scatter merge)
    matches the replicated-psum path bit-for-bit."""

    def test_matches_replicated(self, mesh8):
        import jax.numpy as jnp

        from mq3d_tpu.parallel.sharded import (
            create_state_partitioned,
            sharded_integrate_step,
        )

        depth, K, T, valid = make_frames(16)
        step_r = sharded_integrate_step(CFG, mesh8)
        step_p = sharded_integrate_step(CFG, mesh8, partition_state=True)

        from mq3d_tpu.ops.tsdf import create_state

        s_r = create_state(CFG)
        s_p = create_state_partitioned(CFG, mesh8)
        for s in (0, 8):
            args = (
                jnp.asarray(depth[s:s + 8]), jnp.asarray(K[s:s + 8]),
                jnp.asarray(T[s:s + 8]), jnp.asarray(valid[s:s + 8]),
            )
            s_r = step_r(s_r, *args)
            s_p = step_p(s_p, *args)

        cap1 = CFG.block_count + 1
        assert int(s_p.n_active) == int(s_r.n_active)
        np.testing.assert_array_equal(
            np.asarray(s_p.slot_table), np.asarray(s_r.slot_table))
        np.testing.assert_array_equal(
            np.asarray(s_p.tsdf)[:cap1], np.asarray(s_r.tsdf))
        np.testing.assert_array_equal(
            np.asarray(s_p.weight)[:cap1], np.asarray(s_r.weight))
        # pad rows beyond the sentinel stay zero
        assert float(np.abs(np.asarray(s_p.tsdf)[cap1:]).max(initial=0)) == 0


class TestShardedColorGN:
    def test_matches_vmap(self, mesh8):
        import jax.numpy as jnp

        from mq3d_tpu.recon.color_opt import _gn_terms_batch, _sharded_gn

        rng = np.random.default_rng(2)
        n_verts, B, h, w = 500, 8, 24, 32
        verts = jnp.asarray(rng.uniform(-1, 1, (n_verts, 3)), jnp.float32)
        K = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
        K[:, 0, 0] = K[:, 1, 1] = 20.0
        K[:, 0, 2], K[:, 1, 2] = w / 2, h / 2
        T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        T[:, 2, 3] = np.linspace(2.0, 3.0, B)
        gray = jnp.asarray(rng.random((B, h, w)), jnp.float32)
        gx = jnp.asarray(rng.random((B, h, w)), jnp.float32)
        gy = jnp.asarray(rng.random((B, h, w)), jnp.float32)
        target = jnp.asarray(rng.random(n_verts), jnp.float32)
        vis = jnp.asarray(rng.random((B, n_verts)) > 0.3)

        a = _gn_terms_batch(verts, jnp.asarray(K), jnp.asarray(T), gray,
                            gx, gy, target, vis)
        b = _sharded_gn(mesh8)(verts, jnp.asarray(K), jnp.asarray(T), gray,
                               gx, gy, target, vis)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-8)


class TestMultihostBatch:
    def test_assignment_partition(self):
        from mq3d_tpu.parallel.multihost import assign_sessions

        all_idx = sorted(
            i for h in range(3) for i in assign_sessions(10, 3, h)
        )
        assert all_idx == list(range(10))  # disjoint + complete

    def test_single_host_batch_rollup(self, tmp_path):
        """batch_sessions_multihost with a stub runner: failure isolation
        + status vector semantics."""
        from mq3d_tpu.parallel.multihost import batch_sessions_multihost

        dirs = [tmp_path / f"2025010{i}_120000" for i in range(4)]
        for d in dirs:
            d.mkdir()

        def runner(session):
            if session.name.endswith("2_120000"):
                raise RuntimeError("boom")  # isolated, not fatal
            return not session.name.endswith("1_120000")

        status = batch_sessions_multihost(dirs, runner=runner,
                                          host_id=0, n_hosts=1)
        np.testing.assert_array_equal(status, [1, 0, 0, 1])

    def test_sharded_host_sees_only_its_shard(self, tmp_path):
        from mq3d_tpu.parallel.multihost import batch_sessions_multihost

        dirs = [tmp_path / f"2025010{i}_120000" for i in range(5)]
        for d in dirs:
            d.mkdir()
        ran = []
        status = batch_sessions_multihost(
            dirs, runner=lambda s: ran.append(s.name) or True,
            host_id=1, n_hosts=2,
        )
        assert [n[7] for n in ran] == ["1", "3"]  # strided shard
        # No DCN transport in-process: remote sessions stay unknown.
        np.testing.assert_array_equal(status, [-1, 1, -1, 1, -1])

    def test_dryrun_on_virtual_mesh(self):
        from mq3d_tpu.parallel.multihost import dryrun_batch_multihost

        merged = dryrun_batch_multihost(8, n_sessions=11)
        expect = np.ones(11, np.int32)
        expect[1] = 0
        np.testing.assert_array_equal(merged, expect)
