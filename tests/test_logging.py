"""Observability utilities."""
import pytest
import json
import os

from fpqvar_tpu.utils.logging import MetricLogger, SmoothedValue, Timer

pytestmark = pytest.mark.quick


def test_smoothed_value():
    s = SmoothedValue(window=3)
    for v in [1.0, 2.0, 3.0, 4.0]:
        s.update(v)
    assert s.avg == 3.0       # window [2,3,4]
    assert s.global_avg == 2.5
    assert s.median == 3.0


def test_metric_logger_jsonl(tmp_path):
    path = os.path.join(tmp_path, "m.jsonl")
    ml = MetricLogger(jsonl_path=path)
    ml.update(step=0, loss=1.0)
    ml.update(step=1, loss=0.5)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2 and lines[1]["loss"] == 0.5
    assert abs(ml.summary()["loss"] - 0.75) < 1e-9
    assert "loss" in str(ml)


def test_timer():
    t = Timer()
    with t.stage("a"):
        pass
    assert "a" in t.stages and t.stages["a"] >= 0
