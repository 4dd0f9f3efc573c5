"""Bench idle-anchor classification + full-payload identity (r11).

VERDICT r10 #1: the anchor must emit an explicit machine-readable
verdict covering ALL observed signatures — including r10's
fresh >> main >> prev, which the old two-pattern decision table could
not name (cause: the anchor child itself ran on a loaded host).

ADVICE r10 (bench.py:210): BENCH_FULL_latest.json substitution must be
keyed on a run nonce, not a total-within-20ms coincidence.
"""

import json

import bench


class TestClassifyAnchor:
    def test_host_load_fresh_refutes_drift(self):
        # r9 signature: main drifted 3x but the fresh re-run lands
        # back on last round's numbers -> environment, not the plan
        assert (
            bench.classify_anchor(
                main_total=41.0, fresh_total=13.0, prev_total=12.4,
                cal_factor=1.0, load1_per_cpu=0.1,
            )
            == "host-load"
        )

    def test_regression_fresh_confirms_main(self):
        # fresh ~ main, both >> prev, quiet host -> real plan regression
        assert (
            bench.classify_anchor(
                main_total=41.0, fresh_total=38.0, prev_total=12.4,
                cal_factor=1.1, load1_per_cpu=0.2,
            )
            == "regression"
        )

    def test_r10_signature_is_anchor_contended(self):
        # the exact r10 artifact numbers (fresh 71.7 >> main 41.1 >>
        # prev 12.4) with a loaded-host calibration factor: the old
        # table had no branch for this; now it is named
        assert (
            bench.classify_anchor(
                main_total=41.061, fresh_total=71.679, prev_total=12.37,
                cal_factor=3.5, load1_per_cpu=0.4,
            )
            == "anchor-contended"
        )

    def test_loadavg_alone_flags_contention(self):
        assert (
            bench.classify_anchor(
                main_total=41.0, fresh_total=70.0, prev_total=12.4,
                cal_factor=1.0, load1_per_cpu=2.0,
            )
            == "anchor-contended"
        )

    def test_inconclusive_middle_ground(self):
        # fresh well below main but still >1.3x prev on a quiet host:
        # neither refuted nor reproduced
        assert (
            bench.classify_anchor(
                main_total=41.0, fresh_total=20.0, prev_total=12.4,
                cal_factor=1.0, load1_per_cpu=0.1,
            )
            == "inconclusive"
        )

    def test_zero_prev_is_not_a_crash(self):
        out = bench.classify_anchor(
            main_total=1.0, fresh_total=1.0, prev_total=0.0,
            cal_factor=1.0, load1_per_cpu=0.1,
        )
        assert out in {"regression", "anchor-contended", "inconclusive"}


class TestPrevBenchNonce:
    def _write(self, tmp_path, artifact, full):
        (tmp_path / "BENCH_r99.json").write_text(json.dumps(artifact))
        (tmp_path / "BENCH_FULL_latest.json").write_text(json.dumps(full))

    def test_nonce_match_substitutes_full_queries(self, tmp_path):
        artifact = {
            "parsed": {
                "queries": {"q1": 1.0},
                "value": 3.0,
                "nonce": "abc123",
            }
        }
        full = {"queries": {"q1": 1.0, "q2": 2.0}, "value": 3.0, "nonce": "abc123"}
        self._write(tmp_path, artifact, full)
        rnd, queries = bench.prev_bench(base_dir=str(tmp_path))
        assert rnd == 99
        assert queries == {"q1": 1.0, "q2": 2.0}

    def test_nonce_mismatch_keeps_driver_queries(self, tmp_path):
        # a manual re-run that lands within 20 ms of the recorded total
        # (the ADVICE r10 scenario) must NOT substitute its numbers when
        # the artifact carries a nonce
        artifact = {
            "parsed": {
                "queries": {"q1": 1.0},
                "value": 3.0,
                "nonce": "abc123",
            }
        }
        full = {
            "queries": {"q1": 1.0, "q2": 2.0},
            "value": 3.001,  # within the old 0.02 heuristic
            "nonce": "manual-rerun",
        }
        self._write(tmp_path, artifact, full)
        rnd, queries = bench.prev_bench(base_dir=str(tmp_path))
        assert queries == {"q1": 1.0}

    def test_legacy_artifact_falls_back_to_total(self, tmp_path):
        # pre-r11 artifacts have no nonce: the total heuristic stands
        artifact = {"parsed": {"queries": {"q1": 1.0}, "value": 3.0}}
        full = {"queries": {"q1": 1.0, "q2": 2.0}, "value": 3.001, "nonce": "x"}
        self._write(tmp_path, artifact, full)
        rnd, queries = bench.prev_bench(base_dir=str(tmp_path))
        assert queries == {"q1": 1.0, "q2": 2.0}


class TestCompareAnchor:
    """VERDICT r14 #2: the regression arm compares fresh-to-fresh.
    The scenarios mirror the two observed host days: the r13/r14
    false-"regression" signature (idle code, fresh walls carrying the
    per-JVM warm-up constant) and a genuine plan regression."""

    # a 3-key drifted set: main-run walls, this run's fresh-JVM walls,
    # prev round's WARM walls (systematically below fresh: the batched
    # run amortizes JVM warm-up), and the stored clean-host fresh walls
    KEYS = ["a", "b", "c"]
    TIMINGS = {"a": 5.0, "b": 4.0, "c": 3.0}
    PREV_WARM = {"a": 3.0, "b": 2.5, "c": 2.0}

    def test_idle_day_false_regression_now_classifies_host_load(self):
        # the r14 signature: fresh walls land ON the fresh baseline
        # (the plan did not move) but sit 1.6x over prev's warm walls
        fresh = {"a": 5.1, "b": 3.9, "c": 3.1}
        baseline = {"a": 5.0, "b": 4.0, "c": 3.0}
        out = bench.compare_anchor(
            self.KEYS, self.TIMINGS, fresh, self.PREV_WARM, baseline,
            cal_factor=1.0, load1_per_cpu=0.1,
        )
        assert out["verdict"] == "host-load"          # fresh ~ fresh-base
        assert out["verdict_warm_baseline"] == "regression"  # the blind spot
        assert out["n_baseline_covered"] == 3
        assert out["fresh_baseline_total"] == 12.0
        assert out["keys"]["a"]["fresh_baseline"] == 5.0

    def test_genuine_regression_flags_on_both_arms(self):
        # fresh walls 2x the fresh baseline AND ~ main: the plan moved
        fresh = {"a": 10.0, "b": 8.0, "c": 6.0}
        baseline = {"a": 5.0, "b": 4.0, "c": 3.0}
        timings = {"a": 11.0, "b": 8.5, "c": 6.5}
        out = bench.compare_anchor(
            self.KEYS, timings, fresh, self.PREV_WARM, baseline,
            cal_factor=1.0, load1_per_cpu=0.1,
        )
        assert out["verdict"] == "regression"
        assert out["verdict_warm_baseline"] == "regression"

    def test_loaded_anchor_still_reads_contended(self):
        fresh = {"a": 10.0, "b": 8.0, "c": 6.0}
        baseline = {"a": 5.0, "b": 4.0, "c": 3.0}
        out = bench.compare_anchor(
            self.KEYS, self.TIMINGS, fresh, self.PREV_WARM, baseline,
            cal_factor=3.0, load1_per_cpu=0.1,
        )
        assert out["verdict"] == "anchor-contended"

    def test_cold_start_falls_back_to_warm_arm(self):
        fresh = {"a": 5.1, "b": 3.9, "c": 3.1}
        out = bench.compare_anchor(
            self.KEYS, self.TIMINGS, fresh, self.PREV_WARM, {},
            cal_factor=1.0, load1_per_cpu=0.1,
        )
        assert out["fresh_baseline_total"] is None
        assert out["n_baseline_covered"] == 0
        assert out["verdict"] == out["verdict_warm_baseline"]

    def test_partial_coverage_compares_covered_subset(self):
        fresh = {"a": 5.1, "b": 3.9, "c": 3.1}
        baseline = {"a": 5.0}  # only one key ever anchored before
        out = bench.compare_anchor(
            self.KEYS, self.TIMINGS, fresh, self.PREV_WARM, baseline,
            cal_factor=1.0, load1_per_cpu=0.1,
        )
        assert out["n_baseline_covered"] == 1
        assert out["fresh_baseline_total"] == 5.0
        assert out["fresh_covered_total"] == 5.1
        assert out["verdict"] == "host-load"


class TestAnchorFreshBaseline:
    def test_clean_run_updates_and_merges(self, tmp_path):
        d = str(tmp_path)
        assert bench.anchor_fresh_baseline(d) == {}
        assert bench.update_anchor_fresh_baseline(
            {"a": 5.0, "b": None}, cal_factor=1.0, load1_per_cpu=0.1,
            base_dir=d,
        )
        assert bench.anchor_fresh_baseline(d) == {"a": 5.0}  # None skipped
        assert bench.update_anchor_fresh_baseline(
            {"b": 4.0}, cal_factor=1.0, load1_per_cpu=0.1, base_dir=d
        )
        assert bench.anchor_fresh_baseline(d) == {"a": 5.0, "b": 4.0}

    def test_contended_run_never_writes(self, tmp_path):
        d = str(tmp_path)
        bench.update_anchor_fresh_baseline(
            {"a": 5.0}, cal_factor=1.0, load1_per_cpu=0.1, base_dir=d
        )
        # calibration-contended: read-only
        assert not bench.update_anchor_fresh_baseline(
            {"a": 50.0}, cal_factor=3.0, load1_per_cpu=0.1, base_dir=d
        )
        # loadavg-contended: read-only
        assert not bench.update_anchor_fresh_baseline(
            {"a": 50.0}, cal_factor=1.0, load1_per_cpu=2.0, base_dir=d
        )
        assert bench.anchor_fresh_baseline(d) == {"a": 5.0}


def test_calibrate_host_returns_positive_seconds():
    sec = bench.calibrate_host()
    assert 0.01 < sec < 120.0


def test_calibrate_host_mt_returns_positive_seconds():
    # 4 threads (not ncpu) keeps the unit test cheap; the function's
    # contract — a positive steady wall — is thread-count independent
    sec = bench.calibrate_host_mt(n_threads=4)
    assert 0.01 < sec < 120.0


class TestPerCpuFullPayload:
    """VERDICT r15 "what's wrong" #1: the driver's 8-core re-run used to
    clobber BENCH_FULL_latest.json; per-core-count files plus a
    candidate scan in prev_bench make the 32-core record durable."""

    def test_nonce_match_found_in_per_cpu_file(self, tmp_path):
        artifact = {
            "parsed": {
                "queries": {"q1": 1.0},
                "value": 3.0,
                "nonce": "run32",
            }
        }
        # "latest" holds the CLOBBERING 8-core run; the c32 file holds
        # the matching full payload
        (tmp_path / "BENCH_r99.json").write_text(json.dumps(artifact))
        (tmp_path / "BENCH_FULL_latest.json").write_text(
            json.dumps({"queries": {"q1": 9.0}, "value": 9.0, "nonce": "run8"})
        )
        (tmp_path / "BENCH_FULL_c32.json").write_text(
            json.dumps(
                {"queries": {"q1": 1.0, "q2": 2.0}, "value": 3.0,
                 "nonce": "run32"}
            )
        )
        rnd, queries = bench.prev_bench(base_dir=str(tmp_path))
        assert rnd == 99
        assert queries == {"q1": 1.0, "q2": 2.0}

    def test_path_for_cpus(self, tmp_path):
        p = bench.full_payload_path_for_cpus(8, base_dir=str(tmp_path))
        assert p.endswith("BENCH_FULL_c8.json")


def test_wait_for_idle_drains_then_returns_true():
    """r12: the anchor false-positived a 1.14x quiet-host result into a
    1.75x "regression" because it calibrated while the main run's
    32-thread load was still draining. wait_for_idle polls the 1-min
    loadavg down to the target before the anchor calibrates."""
    from bench import wait_for_idle

    loads = iter([(8.0, 9.0, 9.0), (6.0, 8.0, 9.0), (5.1, 7.0, 9.0),
                  (0.9, 6.0, 9.0)])
    slept = []
    ok = wait_for_idle(
        32,
        _getloadavg=lambda: next(loads),
        _sleep=slept.append,
    )
    assert ok and len(slept) == 3  # polled until 0.9/32 < 0.15


def test_wait_for_idle_times_out_under_persistent_load():
    from bench import wait_for_idle

    ok = wait_for_idle(
        32,
        max_wait_sec=20.0,
        _getloadavg=lambda: (30.0, 30.0, 30.0),
        _sleep=lambda s: None,
    )
    assert not ok  # anchor proceeds; recorded loadavg witnesses it
