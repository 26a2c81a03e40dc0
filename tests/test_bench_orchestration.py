"""bench.py scale-ladder orchestration (no device, no subprocesses).

The driver's perf artifact depends on ``_scale_subprocess`` budget
arithmetic: a hung large-scale child must never consume the fallback
scales' wall budget (the round-5 rehearsal failure mode — full_corpus
timed out holding the WHOLE remaining budget and the fallbacks got
negative seconds), and a child that dies or emits no JSON must fall
through to the next scale. These tests simulate children with a fake
clock + fake subprocess.run and pin that arithmetic.
"""

import json
import subprocess
import sys
import types

import pytest

import bench


class _Clock:
    def __init__(self, start=1000.0):
        self.now = start

    def time(self):
        return self.now

    def sleep(self, secs):
        self.now += secs


class _Child:
    """One simulated bench child: hang (consume full timeout), fail,
    or succeed after ``duration`` seconds."""

    def __init__(self, behavior, duration=60.0, stdout="", rc=0):
        self.behavior = behavior
        self.duration = duration
        self.stdout = stdout
        self.rc = rc


def _install(monkeypatch, clock, children, budget):
    calls = []

    def fake_run(cmd, env=None, capture_output=None, text=None,
                 timeout=None):
        child = children[len(calls)]
        calls.append({"scale": env["BENCH_SCALE"], "timeout": timeout})
        if child.behavior == "hang":
            clock.sleep(timeout)
            raise subprocess.TimeoutExpired(cmd, timeout)
        clock.sleep(child.duration)
        return types.SimpleNamespace(returncode=child.rc,
                                     stdout=child.stdout, stderr="")

    monkeypatch.setattr(bench, "time", clock)
    monkeypatch.setattr(bench, "_T0", clock.now)
    monkeypatch.setattr(bench, "BUDGET_SECS", budget)
    monkeypatch.setattr(subprocess, "run", fake_run)
    # the default small->tiny ladder is what these tests pin
    monkeypatch.delenv("BENCH_SCALE_ORDER", raising=False)
    monkeypatch.delenv("BENCH_SMALL", raising=False)
    return calls


METRIC = json.dumps({"metric": "train_clips_per_sec", "value": 1.0,
                     "unit": "clips/s", "vs_baseline": 1.0})


def test_hung_child_cannot_consume_fallback_budget(monkeypatch):
    """First scale hangs for its entire allowance; the reserve must
    still leave the fallback a viable (>=180 s) child budget."""
    clock = _Clock()
    calls = _install(monkeypatch, clock, [
        _Child("hang"),
        _Child("ok", duration=120.0, stdout="noise\n" + METRIC + "\n"),
    ], budget=1500.0)
    line = bench._scale_subprocess()
    assert json.loads(line)["metric"] == "train_clips_per_sec"
    assert [c["scale"] for c in calls] == ["small", "tiny"]
    # first child: min(1800, 1500 - 60 - 300 reserve) = 1140
    assert calls[0]["timeout"] == pytest.approx(1140.0)
    # after the hang + 30 s spacing sleep, 330 s remain; the fallback
    # still gets 270 s — the reserve arithmetic is what makes this >180
    assert calls[1]["timeout"] == pytest.approx(270.0)


def test_all_children_fail_returns_none(monkeypatch):
    clock = _Clock()
    calls = _install(monkeypatch, clock, [
        _Child("hang"),
        _Child("ok", duration=60.0, stdout="", rc=1),
    ], budget=1500.0)
    assert bench._scale_subprocess() is None
    assert len(calls) == 2


def test_nonzero_rc_with_json_falls_back(monkeypatch):
    """A dead child's partial JSON on stdout must NOT be taken as the
    metric; the next scale runs and its line wins."""
    clock = _Clock()
    calls = _install(monkeypatch, clock, [
        _Child("ok", duration=60.0, stdout=METRIC + "\n", rc=1),
        _Child("ok", duration=60.0, stdout=METRIC + "\n", rc=0),
    ], budget=1500.0)
    assert bench._scale_subprocess() == METRIC
    assert len(calls) == 2


def test_too_little_budget_skips_instead_of_launching(monkeypatch):
    """With less than 180 usable seconds a scale is skipped outright —
    launching a child that cannot finish would burn the wall for
    nothing (and the driver would see a half-written record)."""
    clock = _Clock()
    calls = _install(monkeypatch, clock, [], budget=230.0)
    assert bench._scale_subprocess() is None
    assert calls == []
