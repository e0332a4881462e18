"""Odometry info-matrix, ICP, and pose-graph optimization tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from mq3d_tpu.geometry import se3
from mq3d_tpu.ops.icp import (
    ICPConvergenceCriteria,
    build_grid_nn,
    evaluate_registration,
    get_information_matrix,
    multi_scale_icp,
    registration_icp,
    uniform_down_sample,
    voxel_down_sample,
)
from mq3d_tpu.ops.odometry import odometry_information_matrix
from mq3d_tpu.ops.posegraph import (
    GlobalOptimizationOption,
    PoseGraph,
    PoseGraphEdge,
    global_optimization,
)


def make_surface(rng, n=4000):
    """Wavy surface patch point cloud."""
    xy = rng.uniform(-1, 1, (n, 2))
    z = 0.2 * np.sin(3 * xy[:, 0]) * np.cos(2 * xy[:, 1])
    return np.stack([xy[:, 0], xy[:, 1], z], -1)


class TestDownsample:
    def test_voxel_down_sample(self, rng):
        pts = rng.uniform(0, 1, (1000, 3))
        out = voxel_down_sample(pts, 0.25)
        assert len(out) <= 4 ** 3
        assert len(out) > 10
        # Voxel means lie within their voxel.
        keys = np.floor(out / 0.25)
        assert np.all(out >= keys * 0.25 - 1e-9)

    def test_uniform_down_sample(self, rng):
        pts = rng.uniform(0, 1, (100, 3))
        np.testing.assert_array_equal(uniform_down_sample(pts, 7), pts[::7])


class TestGridNN:
    def test_matches_bruteforce(self, rng):
        tgt = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        src = rng.uniform(0, 1, (200, 3)).astype(np.float32)
        radius = 0.2
        grid = build_grid_nn(tgt, radius, capacity=64)
        from mq3d_tpu.ops.icp import _nn_query, _pad_src

        src_pad, n_src = _pad_src(src)
        idx, dist = _nn_query(
            jnp.asarray(src_pad), jnp.asarray(np.eye(4)), jnp.asarray(grid.target),
            jnp.asarray(grid.order), jnp.asarray(grid.starts),
            jnp.asarray(grid.gmin), jnp.asarray(grid.dims),
            jnp.float32(grid.cell), grid.max_occ,
        )
        idx = np.asarray(idx)[:n_src]
        dist = np.asarray(dist)[:n_src]
        d_bf = np.linalg.norm(src[:, None] - tgt[None], axis=-1)
        true_idx = d_bf.argmin(1)
        true_d = d_bf.min(1)
        within = true_d <= radius
        np.testing.assert_allclose(dist[within], true_d[within], atol=1e-5)
        # Indices may differ on exact ties; distances must match.
        assert (np.abs(dist[within] - true_d[within]) < 1e-5).all()


class TestVoroNN:
    def test_query_near_exact(self, rng):
        """The Voronoi-field neighbor is within O(cell) of the true
        nearest: every true NN within radius is found unless shadowed by a
        nearer-to-cell-center point, which must itself be within
        dist + 2 * cell * sqrt(3)."""
        from mq3d_tpu.ops.icp import VoroNN, _nn_query_voro, _pad_src, build_voronoi_nn

        # Surface-like target at ICP-level density (the production shape:
        # targets are voxel-downsampled fragment surfaces queried at
        # max_corr ~= 2x the downsample voxel).  Volumetrically dense
        # clouds shadow harder and only keep the coverage/bound
        # guarantees.
        tgt = make_surface(rng, 3000).astype(np.float32)
        src = (make_surface(rng, 500)
               + rng.normal(0, 0.01, (500, 3))).astype(np.float32)
        radius = 0.1
        field = build_voronoi_nn(tgt, radius)
        assert isinstance(field, VoroNN)
        src_pad, n_src = _pad_src(src)
        idx, dist = _nn_query_voro(
            jnp.asarray(src_pad), jnp.asarray(np.eye(4)),
            jnp.asarray(field.target), jnp.asarray(field.ids),
            jnp.asarray(field.gmin), jnp.asarray(field.dims),
            jnp.float32(field.cell),
        )
        idx = np.asarray(idx)[:n_src]
        dist = np.asarray(dist)[:n_src]
        d_bf = np.linalg.norm(src[:, None] - tgt[None], axis=-1)
        true_d = d_bf.min(1)
        within = true_d <= radius
        # Coverage: every in-radius query returns SOME candidate...
        assert np.isfinite(dist[within]).all()
        # ...whose true distance is bounded by d* + 2 * cell * sqrt(3).
        bound = true_d[within] + 2 * radius * np.sqrt(3.0)
        assert (dist[within] <= bound + 1e-6).all()
        # Returned distances are true distances to real target points.
        got = np.linalg.norm(src[within] - tgt[idx[within]], axis=-1)
        np.testing.assert_allclose(dist[within], got, atol=1e-5)
        # The approximation finds the exact nearest neighbor for a
        # meaningful fraction of queries (measured ~45-60% at production
        # fragment density; shadowing accounts for the rest, bounded
        # above).  The ICP-level A/B tests below carry the quality
        # guarantee that actually matters.
        frac_exact = (np.abs(dist[within] - true_d[within]) < 1e-6).mean()
        assert frac_exact > 0.3

    def test_icp_matches_exact_grid(self, rng):
        """ICP through the Voronoi field converges to the same transform
        as the exact CSR grid."""
        from mq3d_tpu.ops.icp import build_voronoi_nn

        src = make_surface(rng)
        xi = np.array([0.02, -0.01, 0.03, 0.03, -0.02, 0.01])
        T_true = np.asarray(se3.se3_exp(xi))
        tgt = src @ T_true[:3, :3].T + T_true[:3, 3]

        crit = ICPConvergenceCriteria(30)
        exact = registration_icp(src, tgt, 0.1, criteria=crit,
                                 grid=build_grid_nn(tgt, 0.1))
        voro = registration_icp(src, tgt, 0.1, criteria=crit,
                                grid=build_voronoi_nn(tgt, 0.1))
        err = np.asarray(se3.se3_log(
            np.linalg.inv(exact.transformation) @ voro.transformation))
        assert np.linalg.norm(err) < 5e-3
        assert voro.fitness > 0.9

    def test_batch_shared_voro_flat_and_tiled(self, rng, monkeypatch):
        """registration_icp_batch_shared over a VoroNN: flat and tiled
        paths agree with each other and land near the exact-grid result."""
        import mq3d_tpu.ops.icp as icp_mod
        from mq3d_tpu.ops.icp import (
            build_voronoi_nn, registration_icp_batch_shared,
        )

        target = make_surface(rng, 2000)
        field = build_voronoi_nn(target, 0.1)
        sources, inits = [], []
        for k in range(3):
            xi = rng.normal(size=6) * 0.01
            T = np.asarray(se3.se3_exp(xi))
            src = target @ T[:3, :3].T + T[:3, 3]
            sources.append(src[rng.permutation(len(src))[: 1500 + 100 * k]])
            inits.append(None)
        crit = [icp_mod.ICPConvergenceCriteria(10)] * 3

        flat = registration_icp_batch_shared(
            sources, field, [0.1] * 3, inits=inits, criteria=crit)
        monkeypatch.setattr(icp_mod, "_VMAP_SRC_PAD_LIMIT", 512)
        tiled = registration_icp_batch_shared(
            sources, field, [0.1] * 3, inits=inits, criteria=crit)
        for a, b in zip(flat, tiled):
            np.testing.assert_allclose(
                b.transformation, a.transformation, atol=1e-5)
            assert abs(b.fitness - a.fitness) < 1e-5
            assert a.fitness > 0.9

    @pytest.mark.slow
    def test_degenerate_extent_falls_back_to_grid(self, rng):
        """A tiny radius over a huge extent would densify past the cell
        cap; the builder returns the exact CSR grid instead."""
        from mq3d_tpu.ops.icp import GridNN, build_voronoi_nn

        # ~500 voro cells per axis (125M > the 64M cap) but only ~250
        # CSR cells per axis (cell = 2 * radius), which stays buildable.
        tgt = rng.uniform(0, 50.0, (100, 3)).astype(np.float32)
        grid = build_voronoi_nn(tgt, 0.1)
        assert isinstance(grid, GridNN)


class TestICP:
    def test_recovers_rigid_transform(self, rng):
        src = make_surface(rng)
        xi = np.array([0.03, -0.02, 0.05, 0.04, -0.03, 0.02])
        T_true = np.asarray(se3.se3_exp(xi))
        tgt = src @ T_true[:3, :3].T + T_true[:3, 3]

        result = multi_scale_icp(
            src, tgt,
            voxel_sizes=[0.1, 0.05],
            criteria_list=[ICPConvergenceCriteria(30), ICPConvergenceCriteria(20)],
            max_correspondence_distances=[0.3, 0.1],
        )
        err = np.asarray(se3.se3_log(np.linalg.inv(T_true) @ result.transformation))
        assert np.linalg.norm(err) < 0.02
        assert result.fitness > 0.9

    def test_evaluate_identity(self, rng):
        pts = make_surface(rng, 1000)
        r = evaluate_registration(pts, pts, 0.05)
        assert r.fitness == 1.0
        assert r.inlier_rmse < 1e-5

    def test_information_matrix_formula(self, rng):
        pts = make_surface(rng, 500)
        info = get_information_matrix(pts, pts, 0.05, np.eye(4))
        # Closed form: correspondences are the points themselves.
        q = pts
        G = np.zeros((len(q), 3, 6))
        G[:, 0, 1] = q[:, 2]; G[:, 0, 2] = -q[:, 1]; G[:, 0, 3] = 1
        G[:, 1, 0] = -q[:, 2]; G[:, 1, 2] = q[:, 0]; G[:, 1, 4] = 1
        G[:, 2, 0] = q[:, 1]; G[:, 2, 1] = -q[:, 0]; G[:, 2, 5] = 1
        expected = np.einsum("nri,nrj->ij", G, G)
        np.testing.assert_allclose(info, expected, rtol=1e-4)

    def test_information_matrix_batch_matches_single(self, rng):
        """Shared-target batched info matrices == per-pair op (VERDICT r2
        item 7: one launch per target group instead of per pair)."""
        from mq3d_tpu.ops.icp import build_grid_nn, get_information_matrix_batch
        from mq3d_tpu.geometry.se3 import se3_exp

        target = make_surface(rng, 800)
        grid = build_grid_nn(target, 0.05)
        sources, transforms = [], []
        for k in range(4):
            tw = rng.normal(size=6) * 0.01
            T = np.asarray(se3_exp(jnp.asarray(tw)))
            n = 300 + 50 * k  # ragged sizes exercise the shared pad
            sources.append(target[rng.choice(len(target), n, replace=False)])
            transforms.append(T)
        batch = get_information_matrix_batch(sources, grid, 0.05, transforms)
        for src, T, got in zip(sources, transforms, batch):
            want = get_information_matrix(src, target, 0.05, T, grid=grid)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_batch_info_voro_matches_csr(self, rng):
        """The Voronoi-field information matrices (the pipeline default —
        exact_information_matrices=False) stay within a fraction of a
        percent of the exact CSR scan: only near-tie correspondences can
        pick a different (near-equidistant) target q."""
        from mq3d_tpu.ops.icp import (
            VoroNN,
            build_grid_nn,
            build_voronoi_nn,
            get_information_matrix_batch,
        )
        from mq3d_tpu.geometry.se3 import se3_exp

        target = make_surface(rng, 3000)
        csr = build_grid_nn(target, 0.05)
        voro = build_voronoi_nn(target, 0.05)
        assert isinstance(voro, VoroNN)
        sources, transforms = [], []
        for k in range(3):
            tw = rng.normal(size=6) * 0.01
            sources.append(
                target[rng.choice(len(target), 800, replace=False)])
            transforms.append(np.asarray(se3_exp(jnp.asarray(tw))))
        exact = get_information_matrix_batch(sources, csr, 0.05, transforms)
        approx = get_information_matrix_batch(sources, voro, 0.05, transforms)
        for got, want in zip(approx, exact):
            rel = (np.linalg.norm(got - want, "fro")
                   / max(np.linalg.norm(want, "fro"), 1e-9))
            assert rel < 0.01, rel

    def test_batch_shared_tiled_matches_untiled(self, rng, monkeypatch):
        """Source-tiled batched ICP (the over-pad-limit path, VERDICT r2
        item 10) == the flat vmapped path on the same pairs."""
        import mq3d_tpu.ops.icp as icp_mod
        from mq3d_tpu.ops.icp import (
            build_grid_nn, registration_icp_batch_shared,
        )

        target = make_surface(rng, 2000)
        grid = build_grid_nn(target, 0.1)
        sources, inits = [], []
        for k in range(3):
            xi = rng.normal(size=6) * 0.01
            T = np.asarray(se3.se3_exp(xi))
            src = target @ T[:3, :3].T + T[:3, 3]
            sources.append(src[rng.permutation(len(src))[: 1500 + 100 * k]])
            inits.append(None)
        crit = [icp_mod.ICPConvergenceCriteria(10)] * 3

        flat = registration_icp_batch_shared(
            sources, grid, [0.1] * 3, inits=inits, criteria=crit)
        # Pad limit below the source sizes -> the tiled executable runs.
        monkeypatch.setattr(icp_mod, "_VMAP_SRC_PAD_LIMIT", 512)
        tiled = registration_icp_batch_shared(
            sources, grid, [0.1] * 3, inits=inits, criteria=crit)
        for a, b in zip(flat, tiled):
            np.testing.assert_allclose(
                b.transformation, a.transformation, atol=1e-5)
            assert abs(b.fitness - a.fitness) < 1e-5
            assert abs(b.inlier_rmse - a.inlier_rmse) < 1e-5

    def test_info_batch_tiled_matches_untiled(self, rng, monkeypatch):
        import mq3d_tpu.ops.icp as icp_mod
        from mq3d_tpu.ops.icp import build_grid_nn, get_information_matrix_batch

        target = make_surface(rng, 1200)
        grid = build_grid_nn(target, 0.05)
        sources = [target[: 900], target[100:1100]]
        Ts = [np.eye(4), np.eye(4)]
        flat = get_information_matrix_batch(sources, grid, 0.05, Ts)
        monkeypatch.setattr(icp_mod, "_VMAP_SRC_PAD_LIMIT", 256)
        tiled = get_information_matrix_batch(sources, grid, 0.05, Ts)
        for a, b in zip(flat, tiled):
            np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-3)

    def test_information_matrix_batch_empty_overlap(self, rng):
        from mq3d_tpu.ops.icp import build_grid_nn, get_information_matrix_batch

        target = make_surface(rng, 200)
        grid = build_grid_nn(target, 0.05)
        far = target + 100.0  # no correspondences
        (info,) = get_information_matrix_batch([far], grid, 0.05, [np.eye(4)])
        np.testing.assert_array_equal(info, np.eye(6))


class TestOdometryInfo:
    def test_identity_pair_counts_all_valid(self, rng):
        h, w = 24, 32
        depth = (1.0 + 0.3 * rng.random((h, w))).astype(np.float32)
        K = np.array([[40.0, 0, 16.0], [0, 40.0, 12.0], [0, 0, 1]], np.float32)
        info, n = odometry_information_matrix(
            jnp.asarray(depth), jnp.asarray(depth), jnp.asarray(K),
            jnp.asarray(np.eye(4, dtype=np.float32)),
            dist_threshold=0.07, depth_max=4.0,
        )
        assert int(n) == h * w
        info = np.asarray(info)
        # Parity with a direct numpy evaluation.
        u, v = np.meshgrid(np.arange(w), np.arange(h))
        x = (u - 16.0) * depth / 40.0
        y = (v - 12.0) * depth / 40.0
        q = np.stack([x, y, depth], -1).reshape(-1, 3).astype(np.float64)
        G = np.zeros((len(q), 3, 6))
        G[:, 0, 1] = q[:, 2]; G[:, 0, 2] = -q[:, 1]; G[:, 0, 3] = 1
        G[:, 1, 0] = -q[:, 2]; G[:, 1, 2] = q[:, 0]; G[:, 1, 4] = 1
        G[:, 2, 0] = q[:, 1]; G[:, 2, 1] = -q[:, 0]; G[:, 2, 5] = 1
        expected = np.einsum("nri,nrj->ij", G, G)
        np.testing.assert_allclose(info, expected, rtol=1e-4)

    def test_far_apart_no_correspondence(self, rng):
        h, w = 24, 32
        depth = np.full((h, w), 2.0, np.float32)
        K = np.array([[40.0, 0, 16.0], [0, 40.0, 12.0], [0, 0, 1]], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 1.0  # large forward shift -> distances ~1m >> threshold
        info, n = odometry_information_matrix(
            jnp.asarray(depth), jnp.asarray(depth), jnp.asarray(K),
            jnp.asarray(T), dist_threshold=0.07, depth_max=4.0,
        )
        assert int(n) == 0


class TestPoseGraph:
    def make_ring(self, rng, n=12, noise=0.02):
        """Ground-truth ring of poses + noisy odometry edges + loop edge."""
        gt = []
        for k in range(n):
            a = 2 * np.pi * k / n
            xi = np.array([0, a, 0, np.cos(a), 0.0, np.sin(a)])
            gt.append(np.asarray(se3.se3_exp(xi)))
        gt = np.stack(gt)

        edges = []
        for i in range(n - 1):
            T = np.linalg.inv(gt[i + 1]) @ gt[i]
            pert = np.asarray(se3.se3_exp(rng.normal(scale=noise, size=6)))
            edges.append(PoseGraphEdge(i, i + 1, pert @ T, np.eye(6) * 100, False))
        # Loop closure (exact, uncertain).
        T = np.linalg.inv(gt[0]) @ gt[n - 1]
        edges.append(PoseGraphEdge(n - 1, 0, T, np.eye(6) * 100, True))
        return gt, edges

    def test_optimization_reduces_error(self, rng):
        gt, edges = self.make_ring(rng)
        n = len(gt)
        # Initialize by chaining the noisy odometry.
        init = [gt[0]]
        for i in range(n - 1):
            init.append(init[-1] @ np.linalg.inv(edges[i].transformation))
        pg = PoseGraph(nodes=list(init), edges=edges)

        def pose_err(nodes):
            errs = []
            for i in range(n):
                d = np.asarray(se3.se3_log(np.linalg.inv(gt[i]) @ nodes[i]))
                errs.append(np.linalg.norm(d))
            return np.mean(errs)

        before = pose_err(pg.nodes)
        global_optimization(pg, GlobalOptimizationOption(reference_node=0))
        after = pose_err(pg.nodes)
        assert after < before * 0.7

    def test_outlier_loop_pruned(self, rng):
        gt, edges = self.make_ring(rng, noise=0.005)
        # Add a grossly wrong uncertain loop edge.
        bad = np.eye(4)
        bad[:3, 3] = [5.0, 5.0, 5.0]
        edges.append(PoseGraphEdge(3, 8, bad, np.eye(6) * 100, True))
        n = len(gt)
        init = [gt[0]]
        for i in range(n - 1):
            init.append(init[-1] @ np.linalg.inv(edges[i].transformation))
        pg = PoseGraph(nodes=list(init), edges=list(edges))
        n_edges_before = len(pg.edges)
        global_optimization(pg, GlobalOptimizationOption(reference_node=0))
        assert len(pg.edges) < n_edges_before  # bad loop pruned
        # Good loop retained.
        assert any(e.uncertain for e in pg.edges)


class TestBatchedPoseGraphEdges:
    """compute_pcd_pair_edges_batched produces the same edge set and
    transforms as the serial per-pair path."""

    @pytest.mark.slow
    def test_equivalence(self, tmp_path, rng):
        from mq3d_tpu.config.configs import FragmentPoseRefinementConfig
        from mq3d_tpu.models.side import Side
        from mq3d_tpu.recon.refine import (
            _FragmentCache,
            compute_pcd_pair_edge,
            compute_pcd_pair_edges_batched,
        )

        # Stub IO: fragments are overlapping slabs of a noisy room shell.
        base = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
        frags = []
        for i in range(3):
            shift = np.array([0.02 * i, -0.01 * i, 0.005 * i])
            frags.append(base[i * 1000:(i + 2) * 1000] + shift)

        class _IO:
            def load_fragment_pcd(self, side, index):
                class _P:
                    points = frags[index]
                return _P()

        cfg = FragmentPoseRefinementConfig(
            use_pre_filtering=True,
            pre_filter_every_k_points=5,
            icp_voxel_sizes=[0.05, 0.025],
            max_corr_dists=[0.1, 0.05],
            max_iterations=[20, 10],
            relative_fitnesses=[1e-6, 1e-6],
            relative_rmses=[1e-6, 1e-6],
        )
        nodes = [(Side.LEFT, 0), (Side.LEFT, 1), (Side.LEFT, 2)]
        pairs = [(0, 1, False), (1, 2, False), (0, 2, True)]

        cache_a = _FragmentCache(_IO(), cfg)
        serial = []
        for s, t, unc in pairs:
            e = compute_pcd_pair_edge(cache_a, nodes, s, t, cfg, unc)
            if e is not None:
                serial.append(e)

        cache_b = _FragmentCache(_IO(), cfg)
        batched = compute_pcd_pair_edges_batched(cache_b, nodes, pairs, cfg)

        assert len(serial) == len(batched)
        for a, b in zip(serial, batched):
            assert (a.source_node_id, a.target_node_id) == (
                b.source_node_id, b.target_node_id)
            # vmapped batched matmuls reduce in a different order than the
            # single-pair path: equal to float accumulation noise.
            np.testing.assert_allclose(a.transformation, b.transformation,
                                       atol=1e-6)
            np.testing.assert_allclose(a.information, b.information,
                                       rtol=1e-4)
