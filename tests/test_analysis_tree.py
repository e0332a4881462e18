"""End-to-end test of the statistical analysis & reporting tree.

Builds a synthetic N-pair fog/no-fog study (with a baked-in fog effect on
the directional metrics) and drives every analysis/reporting CLI over it,
asserting the reference's artifact set is produced and that the engine's
test statistics match scipy computed directly
(reference: analysis/analysis/*, analysis/reporting/*)."""

import numpy as np
import pandas as pd
import pytest
from scipy import stats as sps

from mq3d_tpu.analysis.stats import (
    HMD_METRICS,
    QUALITY_METRICS,
    condition_tests,
    improvement_analysis,
    infer_condition,
    paired_values,
    wilcoxon_hypothesis,
)

N_PAIRS = 10


@pytest.fixture(scope="module")
def hmd_df():
    rng = np.random.default_rng(7)
    rows = []
    for i in range(N_PAIRS):
        base = {
            "body_distance_m": rng.uniform(5, 20),
            "body_net_displacement_m": rng.uniform(0.5, 3),
            "body_avg_speed_kmh": rng.uniform(0.5, 2),
            "body_peak_speed_kmh": rng.uniform(2, 6),
            "head_cumulative_radians": rng.uniform(10, 20),
            "head_avg_angular_speed_rad_s": rng.uniform(0.5, 1.5),
            "head_peak_angular_speed_rad_s": rng.uniform(2, 5),
            "yaw_range_rad": rng.uniform(2, 6),
            "pitch_range_rad": rng.uniform(1, 3),
            "roll_range_rad": rng.uniform(0.5, 2),
            "cumulative_vertical_rotation_rad": rng.uniform(10, 25),
            "cumulative_horizontal_rotation_rad": rng.uniform(8, 20),
            "viewing_sphere_coverage_percent": rng.uniform(40, 70),
            "viewing_sphere_coverage_with_fov_percent": rng.uniform(60, 80),
        }
        for cond, boost in (("Fog", 1.25), ("NoFog", 1.0)):
            row = {"participant": f"P{i:02d}", "condition": cond,
                   "capture_name": f"cap_{i}_{cond.lower()}",
                   "capture_path": f"/data/{cond}/cap_{i}",
                   "num_samples": 1000, "duration_seconds": 60.0,
                   "sampling_hz": 16.7}
            for k, v in base.items():
                factor = boost if "rotation" in k or "coverage" in k \
                    or "head" in k else 1.0
                row[k] = v * factor * rng.uniform(0.95, 1.05)
            rows.append(row)
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def quality_df():
    rng = np.random.default_rng(11)
    rows = []
    for i in range(N_PAIRS):
        for cond in ("fog", "nofog"):
            boost = 1.2 if cond == "fog" else 1.0
            rows.append({
                "name": f"P{i:02d}_20260101_{100000 + i:06d}__"
                        f"20260101_{110000 + i:06d}_{cond}",
                "Q_raw": rng.uniform(0.4, 0.7) * boost,
                "Q_norm": rng.uniform(0.2, 0.8) * boost,
                "S_geom": rng.uniform(0.5, 0.9),
                "S_smooth": rng.uniform(0.4, 0.8),
                "S_complete": rng.uniform(0.6, 1.0),
                "S_color": rng.uniform(0.5, 0.9),
                "S_shape": rng.uniform(0.3, 0.7),
                "S_topology": rng.uniform(0.5, 1.0),
                "S_bonuses": rng.uniform(0, 0.2),
                "num_vertices": int(rng.uniform(1e5, 1e6)),
                "num_triangles": int(rng.uniform(2e5, 2e6)),
                "component_count": int(rng.integers(1, 30)),
                "boundary_edge_ratio": rng.uniform(0, 0.2),
                "degenerate_triangles": int(rng.integers(0, 50)),
                "is_manifold": int(rng.integers(0, 2)),
                "is_watertight": int(rng.integers(0, 2)),
                "mean_aspect_ratio": rng.uniform(1.2, 3.0),
                "surface_roughness": rng.uniform(0.001, 0.05),
            })
    return pd.DataFrame(rows)


class TestEngine:
    def test_paired_t_matches_scipy(self, hmd_df):
        stats_df = condition_tests(hmd_df, HMD_METRICS)
        assert len(stats_df) == len(HMD_METRICS)
        # Cross-check one two-sided metric directly against scipy.
        row = stats_df[stats_df["metric"] == "Total Body Distance"].iloc[0]
        fog, nofog, _ = paired_values(hmd_df, "body_distance_m")
        t, p = sps.ttest_rel(fog, nofog)
        if "t-test" in row["test"]:
            assert row["statistic"] == pytest.approx(float(t))
            assert row["p_value"] == pytest.approx(float(p))
        assert row["n_pairs"] == N_PAIRS

    def test_one_tailed_direction(self, hmd_df):
        stats_df = condition_tests(hmd_df, HMD_METRICS)
        cov = stats_df[
            stats_df["metric"] == "Viewing Sphere Coverage (with FOV)"
        ].iloc[0]
        # Fog boosted by ~25%: the one-tailed fog > nofog test must fire.
        assert "one-tailed" in cov["test"] or "greater" in cov["test"]
        assert cov["p_value"] < 0.05
        assert cov["cohens_d"] > 0.8

    def test_improvements(self, hmd_df):
        imps = improvement_analysis(hmd_df, HMD_METRICS)
        names = {i.metric.col for i in imps}
        assert "viewing_sphere_coverage_with_fov_percent" in names
        for i in imps:
            assert len(i.participants) == N_PAIRS
            assert i.p_value < 0.05  # effect baked in

    def test_independent_fallback(self, hmd_df):
        df = hmd_df.drop(columns=["participant"])
        stats_df = condition_tests(df, HMD_METRICS)
        assert (stats_df["n_pairs"].isna()).all()
        assert stats_df["test"].str.contains(
            "Independent|Mann-Whitney").all()

    def test_infer_condition(self):
        df = pd.DataFrame({"capture_path": ["/x/Fog/a", "/x/NoFog/b", "/c"]})
        out = infer_condition(df)
        assert list(out["condition"]) == ["Fog", "NoFog", "Unknown"]

    def test_wilcoxon_hypothesis(self):
        rng = np.random.default_rng(3)
        a = pd.Series(rng.uniform(4, 7, 14))
        u = a - rng.uniform(0.5, 1.5, 14)
        r = wilcoxon_hypothesis(a, u, "greater", "H4")
        w, p = sps.wilcoxon(a.to_numpy(), u.to_numpy(),
                            alternative="greater")
        assert r["statistic"] == pytest.approx(float(w))
        assert r["p_value"] == pytest.approx(float(p))
        assert r["significant"]


class TestHmdScript:
    @pytest.mark.slow
    def test_artifacts(self, hmd_df, tmp_path):
        from scripts.analyze_hmd_motion_stats import main

        csv = tmp_path / "hmd.csv"
        hmd_df.to_csv(csv, index=False)
        out = tmp_path / "report"
        main(["--input_csv", str(csv), "--output_dir", str(out)])

        expected = [
            "statistical_results.csv", "statistical_report.txt",
            "boxplots_comparison.png", "violinplots_comparison.png",
            "summary_bar_chart.png", "paired_participant_plots.png",
            "improvement_analysis.csv", "improvements_summary.png",
        ]
        for name in expected:
            assert (out / name).exists(), name
        assert len(list(out.glob("improvements_*.png"))) >= 6
        report = (out / "statistical_report.txt").read_text()
        for section in ("SIGNIFICANT DIFFERENCES", "IMPROVEMENT ANALYSIS",
                        "INTERPRETATION SUMMARY", "METHODOLOGY"):
            assert section in report
        assert f"Fog condition: {N_PAIRS} sessions" in report

    def test_merge_to_master(self, hmd_df, tmp_path):
        from scripts.analyze_hmd_motion_stats import merge_to_master

        hmd_csv = tmp_path / "hmd.csv"
        hmd_df.to_csv(hmd_csv, index=False)
        master = pd.DataFrame({
            "participant": [f"P{i:02d}" for i in range(N_PAIRS)],
            "pair_id": [str(i) for i in range(N_PAIRS)],
            "fog_session_id": [f"cap_{i}_fog" for i in range(N_PAIRS)],
            "nofog_session_id": [f"cap_{i}_nofog" for i in range(N_PAIRS)],
        })
        master_csv = tmp_path / "master.csv"
        master.to_csv(master_csv, index=False)
        updated = merge_to_master(hmd_csv, master_csv)
        assert updated == 2 * N_PAIRS
        out = pd.read_csv(master_csv)
        assert "fog_hmd_body_distance_m" in out.columns
        assert out["fog_hmd_body_distance_m"].notna().all()


class TestQualityScripts:
    @pytest.mark.slow
    def test_mesh_quality_stats(self, quality_df, tmp_path):
        from scripts.analyze_mesh_quality_stats import main

        csv = tmp_path / "quality_scores.csv"
        quality_df.to_csv(csv, index=False)
        out = tmp_path / "quality"
        main(["--quality-scores", str(csv), "--output-dir", str(out)])
        assert (out / "quality_statistical_results.csv").exists()
        assert (out / "quality_statistical_report.txt").exists()
        assert (out / "boxplots_quality.png").exists()
        res = pd.read_csv(out / "quality_statistical_results.csv")
        assert len(res) == len(QUALITY_METRICS)

    def test_simple_mesh_metrics(self, quality_df, tmp_path):
        from scripts.analyze_simple_mesh_metrics import main

        csv = tmp_path / "quality_scores.csv"
        quality_df.to_csv(csv, index=False)
        out = tmp_path / "simple"
        main(["--quality-scores", str(csv), "--output-dir", str(out)])
        assert (out / "simple_metrics_results.csv").exists()
        assert (out / "simple_metrics_report.txt").exists()

    def test_simple_pairwise_report(self, quality_df, tmp_path):
        from scripts.generate_simple_pairwise_report import main

        csv = tmp_path / "quality_scores.csv"
        quality_df.to_csv(csv, index=False)
        out = tmp_path / "pairwise.html"
        main(["--quality-scores", str(csv), "--output", str(out)])
        html = out.read_text()
        assert "base64" in html and "Summary Table" in html

    @pytest.mark.slow
    def test_comprehensive_analysis(self, quality_df, tmp_path):
        from scripts.generate_comprehensive_quality_analysis import main

        csv = tmp_path / "quality_scores.csv"
        quality_df.to_csv(csv, index=False)
        out = tmp_path / "comprehensive.html"
        main(["--quality-scores", str(csv), "--output", str(out)])
        html = out.read_text()
        for section in ("Executive Summary", "Quality Scores",
                        "Geometry Metrics", "Statistical Summary",
                        "base64"):
            assert section in html


class TestControllerCombined:
    @pytest.fixture(scope="class")
    def controller_df(self, hmd_df):
        rng = np.random.default_rng(13)
        rows = []
        for _, r in hmd_df.iterrows():
            for hand in ("left", "right"):
                rows.append({
                    "capture_name": r["capture_name"],
                    "capture_path": r["capture_path"],
                    "participant": r["participant"],
                    "condition": r["condition"],
                    "hand": hand,
                    "total_distance_m": rng.uniform(20, 80),
                    "net_displacement_m": rng.uniform(0.2, 1),
                    "avg_speed_kmh": rng.uniform(1, 4),
                    "peak_speed_kmh": rng.uniform(5, 15),
                    "avg_acceleration_ms2": rng.uniform(1, 5),
                    "peak_acceleration_ms2": rng.uniform(10, 40),
                    "cumulative_rotation_rad": rng.uniform(50, 200),
                    "avg_angular_speed_rad_s": rng.uniform(1, 4),
                    "peak_angular_speed_rad_s": rng.uniform(5, 20),
                    "workspace_volume_m3": rng.uniform(0.1, 1),
                    "jitter_stddev_m": rng.uniform(0.001, 0.01),
                    "avg_inter_hand_distance_m": np.nan,
                    "synchronization_score": np.nan,
                })
            rows.append({
                "capture_name": r["capture_name"],
                "capture_path": r["capture_path"],
                "participant": r["participant"],
                "condition": r["condition"],
                "hand": np.nan,
                "avg_inter_hand_distance_m": rng.uniform(0.2, 0.6),
                "min_inter_hand_distance_m": rng.uniform(0.01, 0.1),
                "max_inter_hand_distance_m": rng.uniform(0.8, 1.5),
                "inter_hand_distance_stddev_m": rng.uniform(0.05, 0.2),
                "avg_relative_speed_kmh": rng.uniform(1, 3),
                "peak_relative_speed_kmh": rng.uniform(5, 12),
                "movement_correlation": rng.uniform(-0.2, 0.9),
                "synchronization_score": rng.uniform(0.3, 0.9),
            })
        return pd.DataFrame(rows)

    def test_controller_script(self, controller_df, tmp_path):
        from scripts.analyze_controller_motion_stats import main

        csv = tmp_path / "controller.csv"
        controller_df.to_csv(csv, index=False)
        out = tmp_path / "ctl"
        main(["--input_csv", str(csv), "--output_dir", str(out)])
        assert (out / "statistical_results_hand.csv").exists()
        assert (out / "statistical_results_interhand.csv").exists()
        assert (out / "boxplots_hand_metrics.png").exists()
        assert (out / "statistical_report.txt").exists()

    def test_combined_script(self, hmd_df, controller_df, tmp_path):
        from scripts.analyze_combined_motion_stats import main

        hmd_csv = tmp_path / "hmd.csv"
        ctl_csv = tmp_path / "ctl.csv"
        hmd_df.to_csv(hmd_csv, index=False)
        controller_df.to_csv(ctl_csv, index=False)
        out = tmp_path / "combined"
        main(["--hmd_csv", str(hmd_csv), "--controller_csv", str(ctl_csv),
              "--output_dir", str(out)])
        assert (out / "combined_data.csv").exists()
        assert (out / "statistical_results.csv").exists()
        assert (out / "combined_metrics_boxplots.png").exists()
        combined = pd.read_csv(out / "combined_data.csv")
        for col in ("combined_total_distance_m", "activity_score",
                    "engagement_score", "motion_complexity",
                    "workspace_utilization"):
            assert col in combined.columns
            assert combined[col].notna().all()


class TestSurveyDemographics:
    @pytest.fixture(scope="class")
    def survey_df(self):
        rng = np.random.default_rng(5)
        n = 14
        df = pd.DataFrame({
            "Participant": [f"P{i}" for i in range(n)],
            "Age": rng.integers(20, 40, n),
            "Gender": rng.choice(["F", "M", "NB"], n),
            "Nationality": rng.choice(["DE", "FR", "IT"], n),
            "Education - Highest Obtained":
                rng.choice(["BSc", "MSc", "PhD"], n),
            "Education - Currently Pursued":
                rng.choice(["MSc", "PhD", "None"], n),
            "Experience using VR Tools (yrs)": rng.uniform(0, 10, n),
            "Experience with Video Games (yrs)": rng.uniform(0, 20, n),
            "Laterality": rng.choice(["Right", "Left"], n),
            "Glass-wearer": rng.choice(["Yes", "No"], n),
            "Wore glasses during experiment": rng.choice(["Yes", "No"], n),
            "SUS_Score_sphere": rng.uniform(60, 95, n),
        })
        for base in ("FSS_FlowTotal", "TLX_1", "TLX_2", "TLX_4", "TLX_6"):
            df[f"{base}_sphere"] = rng.uniform(2, 6, n)
            df[f"{base}_nosphere"] = rng.uniform(2, 6, n)
        for i in (11, 12, 13, 14):
            df[f"IPQ_{i}_sphere"] = rng.integers(1, 8, n)
            df[f"IPQ_{i}_nosphere"] = rng.integers(1, 8, n)
        return df

    def test_survey_script(self, survey_df, tmp_path):
        from scripts.analyze_survey_hypotheses import main

        csv = tmp_path / "survey.csv"
        survey_df.to_csv(csv, index=False)
        out = tmp_path / "survey"
        main(["--input", str(csv), "--output_dir", str(out)])
        res = pd.read_csv(out / "survey_hypotheses_results.csv")
        assert set(res["hypothesis"]) == {
            "H4_Flow", "H5_Performance", "H6_Realism", "H7a_Physical",
            "H7b_Frustration", "Mental_Demand"}
        report = (out / "statistical_report.txt").read_text()
        assert "SUS SCORE" in report and "H4" in report

    def test_ipq_realism_derivation(self, survey_df):
        from scripts.analyze_survey_hypotheses import derive_ipq_realism

        out = derive_ipq_realism(survey_df)
        expected = (
            (8 - survey_df["IPQ_11_sphere"])
            + survey_df["IPQ_12_sphere"]
            + survey_df["IPQ_13_sphere"]
            + survey_df["IPQ_14_sphere"]) / 4
        assert np.allclose(out["IPQ_Realism_sphere"], expected)

    def test_demographics_script(self, survey_df, tmp_path):
        from scripts.generate_participant_demographics import main

        csv = tmp_path / "survey.csv"
        survey_df.to_csv(csv, index=False)
        out = tmp_path / "demo"
        main(["--input", str(csv), "--output_dir", str(out)])
        for name in ("demographics_table.csv", "demographics_table.tex",
                     "demographics_table.html", "age_distribution.png",
                     "age_distribution.pdf", "gender_distribution.png",
                     "experience_distributions.png", "education_levels.png"):
            assert (out / name).exists(), name
        tex = (out / "demographics_table.tex").read_text()
        assert r"\begin{table}" in tex and r"\toprule" in tex


class TestComputeToAnalyzeLoop:
    """compute_*_motion_stats --summary-csv emits the exact schema the
    analyze_* scripts consume (reference: compute_hmd_motion_stats.py
    summary -> analyze_hmd_motion_stats.py)."""

    def _write_session(self, root, name, seed, fog):
        rng = np.random.default_rng(seed)
        d = root / ("Fog" if fog else "NoFog") / name
        d.mkdir(parents=True)
        n = 200
        t = np.arange(n) * 11.1 + 1.7e12  # ms
        ang = np.linspace(0, 3 * np.pi if fog else 2 * np.pi, n)
        pos = np.stack([np.cos(ang), np.full(n, 1.6), np.sin(ang)], -1)
        pos += rng.normal(0, 0.002, (n, 3))
        quat = np.stack([np.zeros(n), np.sin(ang / 2), np.zeros(n),
                         np.cos(ang / 2)], -1)
        for stem, cols in (("hmd_poses", None), ("controller_poses", "hand")):
            rows = []
            for i in range(n):
                base = dict(unix_time=t[i],
                            pos_x=pos[i, 0], pos_y=pos[i, 1],
                            pos_z=pos[i, 2],
                            rot_x=quat[i, 0], rot_y=quat[i, 1],
                            rot_z=quat[i, 2], rot_w=quat[i, 3])
                if cols == "hand":
                    for hand, off in (("left", -0.3), ("right", 0.3)):
                        r = dict(base)
                        r["hand"] = hand
                        r["pos_x"] += off
                        rows.append(r)
                else:
                    rows.append(base)
            pd.DataFrame(rows).to_csv(d / f"{stem}.csv", index=False)
        return d

    @pytest.mark.slow
    def test_hmd_loop(self, tmp_path):
        import runpy
        import sys

        sessions = []
        participants = []
        for i in range(3):
            for fog in (True, False):
                sessions.append(self._write_session(
                    tmp_path, f"s{i}", seed=10 * i + fog, fog=fog))
                participants.append(f"P{i}")
        summary = tmp_path / "hmd_all_summary.csv"
        argv = (["compute_hmd_motion_stats.py"]
                + [str(s) for s in sessions]
                + ["--summary-csv", str(summary)])
        for p_name in participants:
            argv += ["--participant", p_name]
        old = sys.argv
        sys.argv = argv
        try:
            runpy.run_path("scripts/compute_hmd_motion_stats.py",
                           run_name="__main__")
        finally:
            sys.argv = old
        df = pd.read_csv(summary)
        assert len(df) == 6
        for col in ("body_distance_m", "head_cumulative_radians",
                    "viewing_sphere_coverage_with_fov_percent",
                    "cumulative_horizontal_rotation_rad", "condition",
                    "participant"):
            assert col in df.columns
        assert set(df["condition"]) == {"Fog", "NoFog"}

        from scripts.analyze_hmd_motion_stats import main as analyze

        out = tmp_path / "report"
        analyze(["--input_csv", str(summary), "--output_dir", str(out)])
        assert (out / "statistical_results.csv").exists()
        res = pd.read_csv(out / "statistical_results.csv")
        assert len(res) >= 10  # all schema metrics were present

    @pytest.mark.slow
    def test_controller_loop(self, tmp_path):
        import runpy
        import sys

        sessions = []
        for i in range(2):
            for fog in (True, False):
                sessions.append(self._write_session(
                    tmp_path, f"c{i}", seed=100 + 10 * i + fog, fog=fog))
        summary = tmp_path / "controller_all_summary.csv"
        argv = (["compute_controller_motion_stats.py"]
                + [str(s) for s in sessions]
                + ["--summary-csv", str(summary),
                   "--participant", "P0", "--participant", "P0",
                   "--participant", "P1", "--participant", "P1"])
        old = sys.argv
        sys.argv = argv
        try:
            runpy.run_path("scripts/compute_controller_motion_stats.py",
                           run_name="__main__")
        finally:
            sys.argv = old
        df = pd.read_csv(summary)
        # 2 hand rows + 1 inter-hand row per session
        assert len(df) == 12
        hand_rows = df[df["hand"].notna()]
        inter_rows = df[df["hand"].isna()]
        assert len(hand_rows) == 8 and len(inter_rows) == 4
        assert (inter_rows["avg_inter_hand_distance_m"] > 0.3).all()
        assert (inter_rows["synchronization_score"] > 0).all()

        from scripts.analyze_controller_motion_stats import main as analyze

        out = tmp_path / "ctl_report"
        analyze(["--input_csv", str(summary), "--output_dir", str(out)])
        assert (out / "statistical_results_hand.csv").exists()
        assert (out / "statistical_results_interhand.csv").exists()
