"""Unit-test bench.py's TPU-history record helpers (the fallback path must
quote the most recent REAL-TPU run, clearly labeled)."""

import importlib.util
import json
import os
import sys


def _load_bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(repo, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_append_and_read_roundtrip(tmp_path, monkeypatch):
    bench = _load_bench()
    hist = tmp_path / "hist.jsonl"
    monkeypatch.setattr(bench, "TPU_HISTORY", str(hist))
    assert bench._last_tpu_record() is None
    bench._append_tpu_record({"metric": "m", "value": 123.0}, "TPU v5 lite")
    bench._append_tpu_record({"metric": "m", "value": 456.0}, "TPU v5 lite")
    last = bench._last_tpu_record()
    assert last["value"] == 456.0
    assert last["device_kind"] == "TPU v5 lite"
    assert last["utc"]
    # two lines, both valid json
    lines = [json.loads(l) for l in hist.read_text().splitlines()]
    assert [r["value"] for r in lines] == [123.0, 456.0]


def test_last_record_tolerates_garbage(tmp_path, monkeypatch):
    bench = _load_bench()
    hist = tmp_path / "hist.jsonl"
    hist.write_text("not json\n")
    monkeypatch.setattr(bench, "TPU_HISTORY", str(hist))
    assert bench._last_tpu_record() is None
