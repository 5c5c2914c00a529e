"""Unit tests for tools/metrics.py StageMetrics — the invalid-sample
contract (ADVICE r5 item 4): a reading that was never stable must be
reported as None, not fabricated as 0 bytes or all-of-history totals."""

from __future__ import annotations

from tools.metrics import FIELDS, StageMetrics


def _bare(stage_seqs):
    """StageMetrics with a scripted _stages() — no Spark, no UI.
    ``stage_seqs`` yields per _stages() call: a list of stage dicts,
    or None (endpoint unreachable). The last element repeats forever."""
    sm = StageMetrics.__new__(StageMetrics)
    sm._hwm = -1
    sm._snapshot_ok = False
    seq = list(stage_seqs)
    calls = {"n": 0}

    def _stages():
        i = min(calls["n"], len(seq) - 1)
        calls["n"] += 1
        return seq[i]

    sm._stages = _stages
    return sm


def _stage(sid, mb):
    s = {"stageId": sid}
    s.update({f: mb for f in FIELDS})
    return s


def test_delta_none_when_endpoint_never_responds(monkeypatch):
    monkeypatch.setattr("tools.metrics.time.sleep", lambda s: None)
    sm = _bare([None])
    sm.snapshot()
    assert sm._snapshot_ok is False
    # the old fallback attributed ALL history to the workload here
    assert sm.delta() is None


def test_delta_none_when_no_stable_post_snapshot_reading(monkeypatch):
    monkeypatch.setattr("tools.metrics.time.sleep", lambda s: None)
    # snapshot stabilizes at hwm=5, but afterwards the endpoint dies
    sm = _bare([[_stage(5, 10)]])
    sm.snapshot()
    assert sm._snapshot_ok is True and sm._hwm == 5
    sm._stages = lambda: None  # endpoint gone for the delta window
    assert sm.delta() is None


def test_delta_counts_only_post_snapshot_stages(monkeypatch):
    monkeypatch.setattr("tools.metrics.time.sleep", lambda s: None)
    sm = _bare([[_stage(5, 10)]])
    sm.snapshot()
    assert sm._hwm == 5
    sm._stages = lambda: [_stage(5, 10), _stage(6, 7), _stage(7, 3)]
    d = sm.delta()
    assert d is not None
    assert d["inputBytes"] == 10  # stages 6+7 only, stage 5 excluded


def test_fresh_app_zero_stages_is_a_valid_mark(monkeypatch):
    """hwm == -1 from a RESPONSIVE endpoint (fresh app, nothing
    completed yet) is legitimate — every later stage is post-snapshot."""
    monkeypatch.setattr("tools.metrics.time.sleep", lambda s: None)
    sm = _bare([[]])  # responsive, zero completed stages
    sm.snapshot()
    assert sm._snapshot_ok is True and sm._hwm == -1
    sm._stages = lambda: [_stage(0, 4)]
    d = sm.delta()
    assert d is not None and d["inputBytes"] == 4
