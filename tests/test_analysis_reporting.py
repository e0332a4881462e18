"""Tests for session wrangling tools, master-CSV quality update (the
reference's only test, re-done properly), paired statistics, and motion
stats."""

import csv

import numpy as np
import pytest

from mq3d_tpu.analysis.sessions import (
    analyze_duration_discrepancy,
    analyze_recording_lengths,
    find_optimal_timestamp_offset,
    rename_timestamps,
    trim_recording,
)
from mq3d_tpu.eval.motion_stats import compute_motion_stats
from mq3d_tpu.eval.reporting import (
    DELTA_COL,
    PairQualityScores,
    paired_statistics,
    update_master_fog_report,
    write_pairwise_summary,
    write_statistical_report,
)


@pytest.fixture()
def fake_session(tmp_path):
    """Minimal session with timestamped frame files across modalities."""
    base_ts = 1_000_000
    for d, ext, n in [
        ("left_depth", ".raw", 10),
        ("right_depth", ".raw", 10),
        ("left_camera_rgb", ".png", 10),
        ("right_camera_rgb", ".png", 10),
    ]:
        dd = tmp_path / d
        dd.mkdir()
        for i in range(n):
            (dd / f"{base_ts + i * 33}{ext}").write_bytes(b"x")
    with open(tmp_path / "hmd_poses.csv", "w") as f:
        f.write("unix_time,pos_x,pos_y,pos_z,rot_x,rot_y,rot_z,rot_w\n")
        for i in range(20):
            f.write(f"{base_ts + i * 16},0,0,0,0,0,0,1\n")
    with open(tmp_path / "left_depth_descriptors.csv", "w") as f:
        f.write("timestamp_ms,width\n")
        for i in range(10):
            f.write(f"{base_ts + i * 33},80\n")
    return tmp_path, base_ts


class TestSessions:
    def test_analyze_lengths(self, fake_session):
        proj, t0 = fake_session
        lengths = {m.name: m for m in analyze_recording_lengths(proj)}
        assert lengths["left_depth"].n_frames == 10
        assert lengths["left_depth"].duration_ms == 9 * 33
        assert lengths["hmd_poses"].n_frames == 20

    def test_duration_discrepancy(self, fake_session):
        proj, _ = fake_session
        d = analyze_duration_discrepancy(proj)
        # frame modalities span 297 ms, the pose track 304 ms.
        assert d["max_discrepancy_ms"] == pytest.approx(7.0)

    def test_trim_by_frames(self, fake_session):
        proj, t0 = fake_session
        removed = trim_recording(proj, max_frames=6)
        assert removed["left_depth"] == 4
        assert len(list((proj / "left_depth").glob("*.raw"))) == 6
        # descriptor CSV filtered to the cutoff
        import pandas as pd

        df = pd.read_csv(proj / "left_depth_descriptors.csv")
        assert len(df) == 6
        pose = pd.read_csv(proj / "hmd_poses.csv")
        assert pose["unix_time"].max() <= t0 + 5 * 33

    def test_trim_dry_run(self, fake_session):
        proj, _ = fake_session
        removed = trim_recording(proj, max_frames=6, dry_run=True)
        assert removed["left_depth"] == 4
        assert len(list((proj / "left_depth").glob("*.raw"))) == 10

    def test_rename_offsets(self, fake_session):
        proj, t0 = fake_session
        n = rename_timestamps(proj, offset_ms=100, modalities=["left_depth"])
        assert n == 10
        ts = sorted(int(p.stem) for p in (proj / "left_depth").glob("*.raw"))
        assert ts[0] == t0 + 100

    def test_find_optimal_offset(self, fake_session):
        proj, t0 = fake_session
        rename_timestamps(proj, offset_ms=66, modalities=["left_camera_rgb"])
        result = find_optimal_timestamp_offset(
            proj, source="left_depth", target="left_camera_rgb",
            offsets_ms=np.arange(-100, 101, 11), tolerance_ms=5,
        )
        assert abs(result["best_offset_ms"] - 66) <= 11
        assert result["best_overlap"] > 0.8


def make_master_csv(path):
    fieldnames = [
        "participant", "pair_id",
        "fog_evaluate_quality_score_placeholder",
        "nofog_evaluate_quality_score_placeholder",
    ]
    rows = [
        {"participant": "P1", "pair_id": "A__B",
         "fog_evaluate_quality_score_placeholder": "",
         "nofog_evaluate_quality_score_placeholder": ""},
        {"participant": "P2", "pair_id": "C__D",
         "fog_evaluate_quality_score_placeholder": "",
         "nofog_evaluate_quality_score_placeholder": ""},
    ]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fieldnames)
        w.writeheader()
        w.writerows(rows)


class TestMasterReport:
    def test_update_master_fog_report(self, tmp_path):
        """Re-do of the reference's test_quality_update.py as a real test."""
        master = tmp_path / "master_fog_no_fog_report.csv"
        make_master_csv(master)

        scores = [
            PairQualityScores("P1_A__B_fog", Q_raw=0.7, Q_norm=0.284691,
                              S_geom=0.6, S_smooth=0.5, S_complete=0.8, S_color=0.9),
            PairQualityScores("P1_A__B_nofog", Q_raw=0.8, Q_norm=0.393964,
                              S_geom=0.7, S_smooth=0.6, S_complete=0.9, S_color=0.8),
            # P2's nofog side missing -> row must stay untouched.
            PairQualityScores("P2_C__D_fog", Q_raw=0.5, Q_norm=0.1),
        ]
        meta = [
            {"participant": "P1", "pair_id": "A__B",
             "fog_name": "P1_A__B_fog", "nofog_name": "P1_A__B_nofog"},
            {"participant": "P2", "pair_id": "C__D",
             "fog_name": "P2_C__D_fog", "nofog_name": "P2_C__D_nofog"},
        ]
        update_master_fog_report(master, scores, meta)

        with open(master) as f:
            rows = list(csv.DictReader(f))
        r1, r2 = rows
        assert r1["fog_Q_norm"] == "0.284691"
        assert r1["nofog_Q_norm"] == "0.393964"
        assert r1["fog_evaluate_quality_score_placeholder"] == "0.284691"
        assert abs(float(r1[DELTA_COL]) - (0.393964 - 0.284691)) < 1e-9
        # incomplete pair untouched
        assert r2.get("fog_Q_norm", "") == ""
        assert r2[DELTA_COL] == ""

    def test_update_idempotent(self, tmp_path):
        master = tmp_path / "m.csv"
        make_master_csv(master)
        scores = [
            PairQualityScores("P1_A__B_fog", 0.7, 0.2),
            PairQualityScores("P1_A__B_nofog", 0.8, 0.4),
        ]
        meta = [{"participant": "P1", "pair_id": "A__B",
                 "fog_name": "P1_A__B_fog", "nofog_name": "P1_A__B_nofog"}]
        update_master_fog_report(master, scores, meta)
        first = master.read_text()
        update_master_fog_report(master, scores, meta)
        assert master.read_text() == first

    def test_pairwise_summary(self, tmp_path):
        scores = [
            PairQualityScores("P1_A__B_fog", 0.7, 0.151),
            PairQualityScores("P1_A__B_nofog", 0.8, 0.351),
        ]
        meta = [{"participant": "P1", "pair_id": "A__B",
                 "fog_name": "P1_A__B_fog", "nofog_name": "P1_A__B_nofog"}]
        out = tmp_path / "pairwise_summary.csv"
        write_pairwise_summary(out, scores, meta)
        rows = list(csv.DictReader(open(out)))
        assert len(rows) == 1
        assert float(rows[0]["delta_nofog_minus_fog"]) == pytest.approx(0.2)


class TestStatistics:
    def test_paired_statistics_matches_scipy(self, rng):
        from scipy import stats

        fog = rng.normal(0.8, 0.1, 10)
        nofog = fog - 0.15 + rng.normal(0, 0.02, 10)
        r = paired_statistics("coverage", fog, nofog)
        t, p = stats.ttest_rel(fog, nofog)
        assert r.t_statistic == pytest.approx(float(t))
        assert r.t_pvalue == pytest.approx(float(p))
        assert r.t_pvalue < 0.01  # clearly separated conditions
        assert r.cohens_d > 1.0

    def test_report_files(self, tmp_path, rng):
        fog = rng.normal(0.8, 0.1, 8)
        nofog = rng.normal(0.7, 0.1, 8)
        results = [paired_statistics("m1", fog, nofog),
                   paired_statistics("m2", nofog, fog)]
        write_statistical_report(
            results, tmp_path / "r.txt", tmp_path / "r.csv", tmp_path / "r.html"
        )
        assert "paired t" in (tmp_path / "r.txt").read_text()
        rows = list(csv.DictReader(open(tmp_path / "r.csv")))
        assert len(rows) == 2
        assert "<table" in (tmp_path / "r.html").read_text()


class TestMotionStats:
    def test_straight_line_walk(self):
        n = 100
        t = np.arange(n) * 0.1  # 10 Hz for 10 s
        pos = np.zeros((n, 3))
        pos[:, 0] = np.linspace(0, 5, n)  # 5 m in ~10 s
        rot = np.tile([0.0, 0, 0, 1.0], (n, 1))
        s = compute_motion_stats(t, pos, rot)
        assert s.duration_s == pytest.approx(9.9)
        assert s.total_distance_m == pytest.approx(5.0, rel=1e-6)
        assert s.mean_speed_mps == pytest.approx(5.0 / 9.9, rel=1e-2)
        assert s.total_rotation_deg == pytest.approx(0.0, abs=1e-6)
        assert s.viewing_sphere_coverage_fov < 0.5

    def test_full_yaw_sweep_covers_band(self):
        from mq3d_tpu.geometry import quaternion as quat

        n = 72
        t = np.arange(n) * 0.1
        pos = np.zeros((n, 3))
        angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
        # Yaw about +y axis.
        rot = np.stack(
            [np.zeros(n), np.sin(angles / 2), np.zeros(n), np.cos(angles / 2)], -1
        )
        s = compute_motion_stats(t, pos, rot)
        assert s.total_rotation_deg == pytest.approx(360.0, rel=0.02)
        # Equatorial band with 73 deg FOV covers a sizeable sphere fraction.
        assert 0.3 < s.viewing_sphere_coverage_fov < 0.8
        # Rotation about +y maps to the asin-bounded euler component.
        assert max(s.yaw_range_deg, s.pitch_range_deg, s.roll_range_deg) >= 170
