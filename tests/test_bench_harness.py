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
