"""bench.py's previous-round parsers: the noise-damping re-run picker
must find the bench line inside the DRIVER's wrapped per-round record
(it silently found nothing for every driver-recorded round until round
7 — the damping was inert), and must ignore records from a different
scale factor."""

import json

import bench


def _write_record(dirpath, name, inner, wrap=True):
    line = json.dumps(inner)
    if wrap:
        doc = {"n": 1, "rc": 0, "tail": f"[Stage 1:>]\r\n{line}\n"}
        (dirpath / name).write_text(json.dumps(doc))
    else:
        (dirpath / name).write_text(line)


def test_previous_round_parses_driver_wrapped_record(tmp_path, monkeypatch):
    inner = {
        "metric": "headline_total",
        "value": 1.0,
        "queries": {"q1": 0.5},
        "streaming": {"lane": {"rows_per_sec": 100.0}},
        "sf": 0.1,
    }
    _write_record(tmp_path, "BENCH_r42.json", inner, wrap=True)
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.1")
    assert bench._previous_round_timings() == {"q1": 0.5}
    assert bench._previous_round_streaming() == {"lane": {"rows_per_sec": 100.0}}


def test_previous_round_prefers_newest_and_plain_json(tmp_path, monkeypatch):
    _write_record(
        tmp_path, "BENCH_r01.json",
        {"queries": {"old": 9.0}, "sf": 0.1}, wrap=True,
    )
    _write_record(
        tmp_path, "BENCH_r02.json",
        {"queries": {"new": 1.0}, "sf": 0.1}, wrap=False,
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(bench, "SF_DIR", "/data/sf0.1")
    assert bench._previous_round_timings() == {"new": 1.0}


def test_previous_round_ignores_other_scale_factor(tmp_path, monkeypatch):
    _write_record(
        tmp_path, "BENCH_r42.json",
        {"queries": {"q1": 0.5}, "streaming": {}, "sf": 0.1}, wrap=True,
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.01")
    assert bench._previous_round_timings() == {}
    assert bench._previous_round_streaming() == {}


def test_previous_round_empty_or_torn_is_safe(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(bench, "SF_DIR", "/data/sf0.1")
    assert bench._previous_round_timings() == {}
    (tmp_path / "BENCH_r01.json").write_text("{torn")
    assert bench._previous_round_timings() == {}


def test_previous_round_empty_file_degrades(tmp_path, monkeypatch):
    """An EMPTY record file (zero bytes — no last line at all) must
    degrade to {}, not raise IndexError out of main()."""
    (tmp_path / "BENCH_r03.json").write_text("")
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(bench, "SF_DIR", "/data/sf0.1")
    assert bench._previous_round_bench() == {}
    assert bench._previous_round_timings() == {}


def test_batch_damping_fires_on_synthetic_regression():
    prev = {"q_reg": 1.0, "q_ok": 1.0, "q_edge": 1.0, "q_new": 0.0}
    timings = {"q_reg": 1.146, "q_ok": 1.05, "q_edge": 1.101, "q_other": 9.9}
    flagged = bench._batch_damp_candidates(timings, prev)
    # the exact round-7 miss (1.146x) now triggers; ≤1.10 doesn't;
    # zero/missing previous entries never divide
    assert sorted(flagged) == ["q_edge", "q_reg"]


def test_stream_rerun_replaces_only_flagged_lanes():
    prev = {"a": {"rows_per_sec": 100.0}, "b": {"rows_per_sec": 100.0}}
    streaming = {
        "a": {"rows_per_sec": 80.0},   # regressed → flagged
        "b": {"rows_per_sec": 95.0},   # within band → untouched
    }
    flagged = bench._flagged_stream_lanes(streaming, prev)
    assert flagged == {"a"}
    second = {"a": {"rows_per_sec": 99.0}, "b": {"rows_per_sec": 140.0}}
    bench._apply_stream_rerun(streaming, second, flagged)
    assert streaming["a"] == {"rows_per_sec": 99.0}
    # the unflagged lane must NOT ratchet up to the second rep's max
    assert streaming["b"] == {"rows_per_sec": 95.0}


def test_stream_rerun_keeps_better_first_rep():
    streaming = {"a": {"rows_per_sec": 80.0}}
    bench._apply_stream_rerun(streaming, {"a": {"rows_per_sec": 70.0}}, {"a"})
    assert streaming["a"] == {"rows_per_sec": 80.0}


def test_folded_epoch_ranges_roundtrip():
    """Sidecar range codec: epochs → inclusive [lo, hi] runs → epochs is
    the identity, legacy flat int lists still read, and a year of
    contiguous 1-minute epochs serializes to ONE range."""
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        _epochs_to_ranges,
        _sidecar_epochs,
    )

    cases = [
        set(),
        {5},
        {0, 1, 2, 3},
        {1, 3, 4, 5, 9, 10},
        set(range(525_600)),  # a year of 1-minute triggers
    ]
    for epochs in cases:
        ranges = _epochs_to_ranges(epochs)
        assert _sidecar_epochs({"ranges": ranges}) == epochs
    assert _epochs_to_ranges(set(range(525_600))) == [[0, 525_599]]
    assert _epochs_to_ranges({1, 3, 4, 5, 9, 10}) == [[1, 1], [3, 5], [9, 10]]
    # legacy sidecar form (pre-round-8 flat int list)
    assert _sidecar_epochs([0, 1, 7]) == {0, 1, 7}


def test_range_membership_without_expansion():
    """Round-8 review: the hot heal path tests epoch membership against
    MERGED ranges (bisect), never expanding a year-sized run into one
    int per epoch per micro-batch."""
    from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
        _merge_ranges,
        _ranges_contain,
    )

    # merge coalesces overlapping AND adjacent runs, in any input order
    assert _merge_ranges([[5, 9], [0, 3], [4, 4]]) == [[0, 9]]
    assert _merge_ranges([[10, 12], [0, 3], [5, 5]]) == [[0, 3], [5, 5], [10, 12]]
    assert _merge_ranges([]) == []
    ranges = _merge_ranges([[0, 525_599], [600_000, 600_005]])
    assert ranges == [[0, 525_599], [600_000, 600_005]]
    assert _ranges_contain(ranges, 0)
    assert _ranges_contain(ranges, 525_599)
    assert not _ranges_contain(ranges, 525_600)
    assert _ranges_contain(ranges, 600_003)
    assert not _ranges_contain(ranges, 700_000)
    assert not _ranges_contain([], 1)


def test_bench_compare_normalizes_by_calibration_probe(tmp_path):
    """Round-8 host-drift control: a query ratio within the calibration
    probe's host factor passes the gate; the same ratio on an unchanged
    host fails; a FASTER host never hides a regression (factor floored
    at 1)."""
    import json
    import subprocess
    import sys

    def run(old, new):
        o, n = tmp_path / "o.json", tmp_path / "n.json"
        o.write_text(json.dumps(old))
        n.write_text(json.dumps(new))
        return subprocess.run(
            [sys.executable, "/root/repo/tools/bench_compare.py",
             str(o), str(n), "1.5"],
            capture_output=True, text=True,
        ).returncode

    base = {"queries": {"a": 1.0}, "streaming": {}}
    slow = {"queries": {"a": 1.6}, "streaming": {}}
    # host measured 1.5x slower on the fixed probe: 1.6x raw is in-band
    assert run({**base, "calibration_sec": 0.5},
               {**slow, "calibration_sec": 0.75}) == 0
    # unchanged host: same raw ratio is a real regression
    assert run({**base, "calibration_sec": 0.5},
               {**slow, "calibration_sec": 0.5}) == 1
    # faster host must not excuse anything (factor floored at 1)
    assert run({**base, "calibration_sec": 0.5},
               {**slow, "calibration_sec": 0.25}) == 1
    # records without the probe (pre-round-8) gate on raw ratios
    assert run(base, slow) == 1


def test_damping_consumes_host_normalized_ratios():
    """Round 9: the damping triggers divide out measured host drift. On a
    host the probe measures 1.4x slower, a query uniformly 1.4x slower
    is NOT flagged (the extra rep cannot fix the host), while a genuine
    regression beyond the drift still is; a FASTER host never excuses
    (factor floored at 1)."""
    assert bench._host_factor(0.7, {"calibration_sec": 0.5}) == 1.4
    assert bench._host_factor(0.25, {"calibration_sec": 0.5}) == 1.0  # floor
    assert bench._host_factor(0.5, {}) == 1.0  # pre-probe record

    prev = {"drifted": 1.0, "regressed": 1.0}
    timings = {"drifted": 1.4, "regressed": 2.0}
    assert bench._batch_damp_candidates(timings, prev, 1.4) == ["regressed"]
    # same numbers on an unchanged host: both flag
    assert sorted(bench._batch_damp_candidates(timings, prev, 1.0)) == [
        "drifted", "regressed",
    ]

    sprev = {"drifted": {"rows_per_sec": 100.0}, "regressed": {"rows_per_sec": 100.0}}
    lanes = {
        "drifted": {"rows_per_sec": 100.0 / 1.4},   # pure host drift
        "regressed": {"rows_per_sec": 50.0},        # real drop
    }
    assert bench._flagged_stream_lanes(lanes, sprev, 1.4) == {"regressed"}
    assert bench._flagged_stream_lanes(lanes, sprev, 1.0) == {
        "drifted", "regressed",
    }


def test_bench_compare_normalizes_streaming_gate(tmp_path):
    """Round 9 (ADVICE): the streaming drop gate corrects rows/sec by the
    same host factor as the query gate — a lane 35% down on a host the
    probe measures 1.4x slower is host drift, not a regression; the same
    raw drop on an unchanged host fails; a faster host never hides one."""
    import json
    import subprocess
    import sys

    def run(old, new):
        o, n = tmp_path / "o.json", tmp_path / "n.json"
        o.write_text(json.dumps(old))
        n.write_text(json.dumps(new))
        return subprocess.run(
            [sys.executable, "/root/repo/tools/bench_compare.py",
             str(o), str(n)],
            capture_output=True, text=True,
        ).returncode

    base = {"queries": {}, "streaming": {"lane": {"rows_per_sec": 100.0}}}
    slow = {"queries": {}, "streaming": {"lane": {"rows_per_sec": 65.0}}}
    # 35% raw drop, host probe 1.4x slower → normalized drop 9%: passes
    assert run({**base, "calibration_sec": 0.5},
               {**slow, "calibration_sec": 0.7}) == 0
    # unchanged host: the same 35% drop is a real regression
    assert run({**base, "calibration_sec": 0.5},
               {**slow, "calibration_sec": 0.5}) == 1
    # faster host must not excuse the drop (factor floored at 1)
    assert run({**base, "calibration_sec": 0.5},
               {**slow, "calibration_sec": 0.25}) == 1


def test_storage_drift_picks_scan_bound_rerun_set():
    """Round 10: the scan probe moving >1.3x while the CPU probe stays
    flat flags the regressed queries for an attributed re-run; steady
    storage, or CPU-correlated drift, keeps the set empty (the CPU
    factor's job)."""
    timings = {"scan_q": 3.0, "cpu_q": 1.0, "steady_q": 1.01}
    prev = {"scan_q": 2.0, "cpu_q": 0.95, "steady_q": 1.0}
    # page-cache reclaim signature: storage 1.6x, CPU flat
    picked = bench._storage_rerun_candidates(timings, prev, 1.6, 1.0)
    assert picked == ["scan_q"], picked
    # storage steady → empty regardless of regressions
    assert bench._storage_rerun_candidates(timings, prev, 1.05, 1.0) == []
    # CPU moved with storage → uniform host drift, CPU normalization owns it
    assert bench._storage_rerun_candidates(timings, prev, 1.6, 1.4) == []
    # missing probes degrade to factor 1.0 → never triggers
    assert bench._storage_factor(0.3, {}) == 1.0
    assert bench._storage_factor(0.45, {"scan_probe_sec": 0.3}) == 1.5
    assert bench._storage_factor(0.2, {"scan_probe_sec": 0.3}) == 1.0


def test_previous_round_survives_truncated_driver_artifact(tmp_path, monkeypatch):
    """Round 11 (BENCH_r10 arrived `parsed: null`): when the driver's tail
    window ate the FULL record's head, the compact trailing summary line
    bench.py prints second must still resolve the previous round's
    timings — the damping machinery must not silently disarm."""
    full = {
        "metric": "headline_total", "value": 2.0,
        "queries": {"q1": 0.5, "q2": 1.5},
        "streaming": {"lane": {"rows_per_sec": 100.0, "p50_batch_ms": 7}},
        "sf": 0.1,
    }
    compact = {
        "compact": True, "metric": "headline_total", "value": 2.0,
        "queries": {"q1": 0.5, "q2": 1.5},
        "streaming": {"lane": {"rows_per_sec": 100.0}},
        "sf": 0.1,
    }
    # tail lost the head of the full line; the compact line survived whole
    torn_tail = json.dumps(full)[40:] + "\n" + json.dumps(compact) + "\n"
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps({"n": 1, "rc": 0, "tail": torn_tail})
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.1")
    assert bench._previous_round_timings() == {"q1": 0.5, "q2": 1.5}
    assert bench._previous_round_streaming() == {"lane": {"rows_per_sec": 100.0}}


def test_previous_round_prefers_full_record_over_compact(tmp_path, monkeypatch):
    full = {"queries": {"q1": 0.512}, "streaming": {}, "sf": 0.1}
    compact = {"compact": True, "queries": {"q1": 0.51}, "sf": 0.1}
    tail = json.dumps(full) + "\n" + json.dumps(compact) + "\n"
    (tmp_path / "BENCH_r11.json").write_text(json.dumps({"tail": tail}))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(bench, "SF_DIR", "/data/sf0.1")
    assert bench._previous_round_timings() == {"q1": 0.512}


def test_previous_round_prefers_bench_local_over_driver_artifact(
    tmp_path, monkeypatch
):
    """BENCH_LOCAL.json is the committed full-fidelity copy — immune to
    the capture window — and wins over any driver artifact."""
    (tmp_path / "BENCH_LOCAL.json").write_text(
        json.dumps({"queries": {"q1": 0.7}, "sf": 0.1})
    )
    _write_record(
        tmp_path, "BENCH_r99.json",
        {"queries": {"q1": 9.9}, "sf": 0.1}, wrap=True,
    )
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setattr(bench, "SF_DIR", "/data/sf0.1")
    assert bench._previous_round_timings() == {"q1": 0.7}
    # a torn local file degrades to the driver artifact, not to {}
    (tmp_path / "BENCH_LOCAL.json").write_text("{torn")
    assert bench._previous_round_timings() == {"q1": 9.9}


def test_bench_compare_reads_truncated_artifact_via_compact_line(tmp_path):
    import subprocess
    import sys

    full = {"queries": {"a": 1.0}, "streaming": {"lane": {"rows_per_sec": 50.0}}}
    compact = {
        "compact": True, "queries": {"a": 1.0},
        "streaming": {"lane": {"rows_per_sec": 50.0}},
    }
    torn = {"tail": json.dumps(full)[25:] + "\n" + json.dumps(compact)}
    o, n = tmp_path / "o.json", tmp_path / "n.json"
    o.write_text(json.dumps(torn))
    n.write_text(json.dumps({"queries": {"a": 1.05}, "streaming": {"lane": {"rows_per_sec": 48.0}}}))
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/bench_compare.py", str(o), str(n)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "compact trailing summary" in r.stdout


def test_bench_compare_refuses_same_run_id(tmp_path):
    """Round 12: a torn OLD artifact whose fallback resolves to the very
    record NEW describes is a self-compare, not a comparison — refuse
    loudly (r10->r11 read 1.00x on 39 queries this way)."""
    import subprocess
    import sys

    rec = {"queries": {"a": 1.0}, "run_id": "abc123def456", "sf": 0.1}
    (tmp_path / "BENCH_LOCAL.json").write_text(json.dumps(rec))
    (tmp_path / "o.json").write_text("{torn-to-nothing")
    (tmp_path / "n.json").write_text(json.dumps(rec))
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/bench_compare.py",
         str(tmp_path / "o.json"), str(tmp_path / "n.json")],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    blob = r.stdout + r.stderr
    assert "REFUSING" in blob and "BENCH_HISTORY.jsonl" in blob


def test_bench_compare_refuses_identical_pre_run_id_records(tmp_path):
    """Pre-run_id records that parse to the same dict also refuse —
    equality is the only identity older records carry."""
    import subprocess
    import sys

    rec = {"queries": {"a": 1.0}, "sf": 0.1}
    (tmp_path / "o.json").write_text(json.dumps(rec))
    (tmp_path / "n.json").write_text(json.dumps(rec))
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/bench_compare.py",
         str(tmp_path / "o.json"), str(tmp_path / "n.json")],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "REFUSING" in r.stdout + r.stderr


def test_bench_compare_labels_cross_protocol_streaming(tmp_path):
    """Round 12: when exactly one side predates the discarded session
    warm-up, the streaming comparison is labeled cross-protocol; when
    both carry the flag, no label."""
    import subprocess
    import sys

    old = {
        "queries": {"a": 1.0},
        "streaming": {"lane": {"rows_per_sec": 50.0}},
        "run_id": "aaa",
    }
    new = {
        "queries": {"a": 1.0},
        "streaming": {"lane": {"rows_per_sec": 55.0}},
        "streaming_warmup_discarded": True,
        "run_id": "bbb",
    }
    o, n = tmp_path / "o.json", tmp_path / "n.json"
    o.write_text(json.dumps(old))
    n.write_text(json.dumps(new))
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/bench_compare.py", str(o), str(n)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "CROSS-PROTOCOL" in r.stdout
    assert "warmup_discarded=False" in r.stdout

    old["streaming_warmup_discarded"] = True
    o.write_text(json.dumps(old))
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/bench_compare.py", str(o), str(n)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0
    assert "CROSS-PROTOCOL" not in r.stdout
    assert "warmup_discarded=True" in r.stdout


def test_persist_round_record_archives_history(tmp_path):
    """BENCH_LOCAL.json is latest-wins; BENCH_HISTORY.jsonl is
    append-only — two runs leave two history lines and the second
    record in LOCAL."""
    r1 = {"queries": {"a": 1.0}, "run_id": "r1", "sf": 0.1}
    r2 = {"queries": {"a": 0.9}, "run_id": "r2", "sf": 0.1}
    bench._persist_round_record(r1, str(tmp_path))
    bench._persist_round_record(r2, str(tmp_path))
    assert json.load(open(tmp_path / "BENCH_LOCAL.json"))["run_id"] == "r2"
    lines = [
        json.loads(x)
        for x in (tmp_path / "BENCH_HISTORY.jsonl").read_text().splitlines()
    ]
    assert [x["run_id"] for x in lines] == ["r1", "r2"]
