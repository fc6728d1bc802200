"""The bench output contract: the printed line must fit the driver's
2000-char stdout capture (rounds 2 and 5 lost their bench record when it
didn't), every round-over-round comparator must survive the cut, and the
full result must land in BENCH_FULL.json."""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _emit_and_capture(tmp_path, monkeypatch, payload):
    monkeypatch.setattr(bench, "_here", lambda: str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(payload)
    return buf.getvalue().strip(), tmp_path / "BENCH_FULL.json"


def test_emit_line_fits_capture_window(tmp_path, monkeypatch):
    med = {n: 1.234 for n in bench.HEADLINE}
    payload = {
        "metric": "headline_queries_total", "value": 456.789, "unit": "sec",
        "queries": med, "spread": {n: [1.0, 2.0] for n in med},
        "warm": {n: 0.5 for n in bench.WARM_LANE}, "runs": 3, "sf": 0.1,
    }
    line, full_path = _emit_and_capture(tmp_path, monkeypatch, payload)
    assert len(line) <= bench._LINE_BUDGET + 100
    d = json.loads(line)
    # every comparator the judge diffs round-over-round made the cut
    for name in bench._LINE_PRIORITY:
        if name in med:
            assert name in d["queries"], name
    assert d["value"] == 456.789          # total covers the WHOLE set
    assert d["n_queries"] == len(med)
    assert d["full"] == "BENCH_FULL.json"
    full = json.loads(full_path.read_text())
    assert len(full["queries"]) == len(med)
    assert len(full["spread"]) == len(med)


def test_emit_handles_tiny_payload(tmp_path, monkeypatch):
    payload = {
        "metric": "headline_queries_total", "value": 1.0, "unit": "sec",
        "queries": {"cdc_merge_full": 1.0}, "warm": {}, "runs": 1, "sf": 0.01,
    }
    line, _ = _emit_and_capture(tmp_path, monkeypatch, payload)
    d = json.loads(line)
    assert d["queries"] == {"cdc_merge_full": 1.0}


def test_headline_names_are_registered():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    unknown = [n for n in bench.HEADLINE if n not in q]
    assert not unknown, f"bench.HEADLINE names unknown queries: {unknown}"
    unknown_pri = [n for n in bench._LINE_PRIORITY if n not in bench.HEADLINE]
    assert not unknown_pri


def test_bench_phases_spans_accumulate():
    """mark() closes the span since the previous mark; repeated labels
    accumulate (per-window loops); the tail lands in final_query."""
    import time as _time

    from dataplatform_cdc_pipeline_spark import bench_phases

    bench_phases.reset()
    _time.sleep(0.02)
    bench_phases.mark("w")
    _time.sleep(0.01)
    bench_phases.mark("w")
    _time.sleep(0.03)
    end = _time.time()
    spans = bench_phases.spans(end=end)
    assert set(spans) == {"w", "final_query"}
    assert spans["w"] >= 0.03 and spans["final_query"] >= 0.03
    bench_phases.reset()
    assert bench_phases.spans(end=_time.time()) == {}  # no marks -> no spans


def test_bench_canary_normalization_math():
    """The normalized value is raw/(canary/ref): a run on a 2x-slower box
    (canary doubles) reports the same normalized seconds."""
    import bench

    raw, canary = 10.0, bench._CANARY_REF * 2.0
    assert round(raw / (canary / bench._CANARY_REF), 3) == 5.0


def test_canary_stable_shared_predicate():
    """ADVICE r8: the single-run path must apply the SAME mid-run
    stability check as the multi-run path — the predicate is one shared
    function. It flags >2x pre/post disagreement AND (r9) a uniform
    contention plateau whose median canary is far off the pinned box."""
    ref = bench._CANARY_REF
    assert bench._canary_stable({"canary_samples": [1.0, 1.9], "canary": 1.45})
    assert not bench._canary_stable(
        {"canary_samples": [1.28, 137.8], "canary": 69.5}  # measured r8
    )
    assert not bench._canary_stable({"canary_samples": [2.0], "canary": 2.0})
    assert not bench._canary_stable({"canary_samples": None, "canary": 2.0})
    assert not bench._canary_stable({})
    assert not bench._canary_stable({"canary_samples": [0.0, 1.0], "canary": 0.5})
    # r9 measured plateau: pre/post agree (ratio 1.49) but the box ran
    # ~18x slower than reference the whole time — not a usable baseline
    assert not bench._canary_stable(
        {"canary_samples": [44.2, 29.7], "canary": 36.97}
    )
    # boundary: exactly 5x reference is still accepted, beyond is not
    assert bench._canary_stable({"canary_samples": [9.0, 10.0], "canary": 5.0 * ref})
    assert not bench._canary_stable(
        {"canary_samples": [10.0, 11.0], "canary": 5.0 * ref + 0.1}
    )
    # a stable-looking pre/post pair without the median is not enough
    assert not bench._canary_stable({"canary_samples": [1.0, 1.9]})
    # ADVICE r9: the plateau fence is symmetric — a box uniformly 5x
    # FASTER than reference extrapolates the factor just as far outside
    # anything validated as a 5x-slower plateau does
    assert not bench._canary_stable(
        {"canary_samples": [0.3, 0.35], "canary": 0.325}
    )
    assert bench._canary_stable(
        {"canary_samples": [0.4, 0.45], "canary": ref / 5.0}  # boundary in
    )
    assert not bench._canary_stable(
        {"canary_samples": [0.3, 0.4], "canary": ref / 5.0 - 0.01}
    )


def test_emit_line_carries_stability_flags(tmp_path, monkeypatch):
    """r9 verdict task 3: the PRINTED line (the only thing the driver
    records) must carry canary_stable_runs/canary_all_unstable — without
    them a contended run reads as a real gate-query regression."""
    payload = {
        "metric": "headline_queries_total", "value": 10.0, "unit": "sec",
        "queries": {"cdc_merge_full": 10.0}, "warm": {}, "runs": 3, "sf": 0.1,
        "canary": [2.0, 13.7, 15.0], "canary_ref": 2.0,
        "canary_stable_runs": [True, False, False],
        "canary_all_unstable": False,
    }
    line, _ = _emit_and_capture(tmp_path, monkeypatch, payload)
    d = json.loads(line)
    assert d["canary_stable_runs"] == [True, False, False]
    assert d["canary_all_unstable"] is False


def test_warm_probe_outlier_selection():
    """r9 verdict task 4: movers >1.35x round-over-round (either
    direction), biggest first; sub-noise-floor queries and queries with
    no prior record are excluded."""
    prior = {
        "a": 1.0, "b": 2.0, "c": 4.0, "noise": 0.2, "gone": 3.0, "flat": 5.0,
        "fast": 2.0,
    }
    current = {
        "a": 1.4,      # 1.40x — probed
        "b": 2.6,      # 1.30x — inside the fence
        "c": 17.0,     # 4.25x — biggest mover, first
        "noise": 0.4,  # below 0.5 s floor in prior round
        "new": 9.9,    # no prior record
        "flat": 5.1,
        "fast": 1.0,   # 2x FASTER — also probed (spurious win)
    }
    assert bench._warm_probe_outliers(prior, current) == ["c", "fast", "a"]
    assert bench._warm_probe_outliers({}, current) == []


def test_prior_medians_reads_committed_bench_full(tmp_path, monkeypatch):
    """r10 ADVICE: the probe baseline is the COMMITTED record (git
    HEAD), so a same-round second attempt never compares against its
    own earlier attempt sitting on disk; outside a checkout it falls
    back to the working-tree file, and says which it used."""
    monkeypatch.setattr(bench, "_here", lambda: str(tmp_path))
    # tmp_path is not a git checkout -> both sources absent
    assert bench._prior_medians() == ({}, "none")
    (tmp_path / "BENCH_FULL.json").write_text(
        json.dumps({"queries": {"a": 1.5, "failed": -1.0, "bad": "x"}})
    )
    assert bench._prior_medians() == ({"a": 1.5}, "worktree:BENCH_FULL.json")
    # in a checkout with a committed record, HEAD wins over the
    # (possibly same-round-overwritten) working-tree copy
    import subprocess as sp

    repo = tmp_path / "repo"
    repo.mkdir()
    sp.run(["git", "init", "-q"], cwd=repo, check=True)
    (repo / "BENCH_FULL.json").write_text(json.dumps({"queries": {"a": 9.0}}))
    sp.run(["git", "add", "-A"], cwd=repo, check=True)
    sp.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-qm", "x"],
        cwd=repo, check=True,
    )
    (repo / "BENCH_FULL.json").write_text(json.dumps({"queries": {"a": 1.0}}))
    monkeypatch.setattr(bench, "_here", lambda: str(repo))
    assert bench._prior_medians() == ({"a": 9.0}, "git:HEAD:BENCH_FULL.json")


def test_out_path_is_round_stamped_by_default(tmp_path, monkeypatch):
    """r10 verdict task 4: the default output is stamped with the round
    in flight (max CORRECTNESS round on disk + 1) so a driver-invoked
    bench never aliases the committed BENCH_FULL.json; the env override
    is the builder's explicit opt-in for the clean run."""
    monkeypatch.setattr(bench, "_here", lambda: str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_OUT", raising=False)
    assert bench._out_path() == str(tmp_path / "BENCH_FULL_r0.json")
    (tmp_path / "CORRECTNESS_r09.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r10.json").write_text("{}")
    assert bench._out_path() == str(tmp_path / "BENCH_FULL_r11.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    assert bench._out_path() == str(tmp_path / "BENCH_FULL.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", "/abs/out.json")
    assert bench._out_path() == "/abs/out.json"


def test_emit_names_its_output_file(tmp_path, monkeypatch):
    """The printed line's "full" field names the file the run actually
    wrote (round-stamped by default)."""
    monkeypatch.setattr(bench, "_here", lambda: str(tmp_path))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_OUT", raising=False)
    (tmp_path / "CORRECTNESS_r10.json").write_text("{}")
    payload = {
        "metric": "headline_queries_total", "value": 1.0, "unit": "sec",
        "queries": {"cdc_merge_full": 1.0}, "warm": {}, "runs": 1, "sf": 0.01,
    }
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(payload)
    d = json.loads(buf.getvalue().strip())
    assert d["full"] == "BENCH_FULL_r11.json"
    assert (tmp_path / "BENCH_FULL_r11.json").exists()


def test_warm_probes_are_one_process_per_query():
    """r10 ADVICE: the orchestrator spawns one fresh subprocess PER
    probed query — a shared process re-introduces the ordering effects
    the probe lane exists to disambiguate."""
    import inspect

    src = inspect.getsource(bench.main)
    probe = src.split("for name in take:")[1]
    assert "SPARK_GRAFT_BENCH_WARM_PROBE=name" in probe
    assert "subprocess.run" in probe


def test_single_run_branch_flags_unstable_canary():
    """The runs<=1 emission carries canary_stable_runs/canary_all_unstable
    exactly like the multi-run path (the r8 gap: a lone unstable run
    silently produced a mis-scaled queries_norm)."""
    import inspect

    src = inspect.getsource(bench.main)
    single = src.split("if runs <= 1:")[1].split("# process-isolated")[0]
    assert "_canary_stable(result)" in single
    assert "canary_all_unstable" in single
    assert "canary_stable_runs" in single


def test_emit_carries_canary_and_normalized_total(tmp_path, monkeypatch):
    payload = {
        "metric": "headline_queries_total", "value": 10.0, "unit": "sec",
        "queries": {"cdc_merge_full": 4.0, "cdc_window_scan": 6.0},
        "queries_norm": {"cdc_merge_full": 2.0, "cdc_window_scan": 3.0},
        "warm": {}, "runs": 3, "sf": 0.1,
        "canary": [2.0, 2.1, 4.0], "canary_ref": 2.0,
    }
    line, full_path = _emit_and_capture(tmp_path, monkeypatch, payload)
    d = json.loads(line)
    assert d["canary"] == [2.0, 2.1, 4.0] and d["canary_ref"] == 2.0
    assert d["value_norm"] == 5.0  # sum of normalized medians
    full = json.loads(full_path.read_text())
    assert full["queries_norm"] == payload["queries_norm"]
