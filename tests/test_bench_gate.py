"""bench.py gate behavior (VERDICT r4 item 7): the b1 measurement method is
part of the history key, so a tooling change (xplane protos unavailable ->
slope fallback) can neither fire nor mask a phantom regression by comparing
numbers taken with different clocks."""

import json
import os

import numpy as np
import pytest

import bench


def test_b1_gate_key_tags_method():
    assert bench.b1_gate_key("m_b1_fps", "trace") == "m_b1_fps"
    assert bench.b1_gate_key("m_b1_fps", "slope") == "m_b1_fps_slope"


def test_measure_b1_forced_fallback(monkeypatch, capsys):
    """When the trace path is unavailable the fallback is loud and tagged."""
    monkeypatch.setattr(
        bench, "measure_device_ms_trace", lambda call, sync: (None, None)
    )
    monkeypatch.setattr(
        bench, "measure_device_ms", lambda call, sync: 0.5
    )
    ms, sigma, method = bench.measure_b1_ms(lambda: None, lambda o: None)
    assert (ms, sigma, method) == (0.5, None, "slope")
    assert "WARNING" in capsys.readouterr().err


def test_measure_b1_trace_path(monkeypatch):
    monkeypatch.setattr(
        bench, "measure_device_ms_trace", lambda call, sync: (0.09, 0.002)
    )
    assert bench.measure_b1_ms(lambda: None, lambda o: None) == (
        0.09, 0.002, "trace"
    )


def test_gate_never_compares_across_methods(tmp_path, monkeypatch):
    """A slope-keyed result must not gate against trace-keyed history even
    when the slope number is far below it (the phantom-regression case)."""
    hist = tmp_path / "bench_history.json"
    hist.write_text(json.dumps({"m_b1_fps": 11000.0}))
    monkeypatch.setattr(bench, "HISTORY", str(hist))
    monkeypatch.setattr(
        bench.os if hasattr(bench, "os") else os, "path", os.path
    )
    # regression_gate resolves HISTORY relative to bench.py's dir; patch the
    # join to honor the absolute tmp path
    import os.path as osp

    orig_join = osp.join
    monkeypatch.setattr(
        "os.path.join",
        lambda *a: str(hist) if a and a[-1] == str(hist) else orig_join(*a),
    )
    key = bench.b1_gate_key("m_b1_fps", "slope")
    regs = bench.regression_gate({key: 2000.0})
    assert regs == []  # 2000 vs trace-keyed 11000: no cross-method compare
    saved = json.loads(hist.read_text())
    assert saved["m_b1_fps_slope"] == 2000.0
    assert saved["m_b1_fps"] == 11000.0  # trace history preserved
    # and a genuine same-method regression still fires
    regs = bench.regression_gate({"m_b1_fps": 5000.0})
    assert regs and regs[0][0] == "m_b1_fps"
