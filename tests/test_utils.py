"""Aux subsystems: tracing, profiling, settings."""

import json

import numpy as np

from screenpressor_tpu.config import CodecConfig, lane_count
from screenpressor_tpu.spec.coder import RecCodec, decode_section, encode_section
from screenpressor_tpu.spec.tables import TableSet
from screenpressor_tpu.utils import trace
from screenpressor_tpu.utils.profiling import StageTimer
from screenpressor_tpu.utils.settings import load_settings, make_config, save_settings


def test_lockstep_trace_matches():
    recs = [(1, 200), (0, 3), (2, 50), (1, 10)] * 50
    k = lane_count(len(recs))
    with trace.capture() as enc_tr:
        blobs = encode_section(recs, k, TableSet(), RecCodec())
    with trace.capture() as dec_tr:
        out = decode_section(blobs, len(recs), k, TableSet(), RecCodec())
    assert out == recs
    assert trace.diff_traces(enc_tr, dec_tr) is None
    assert len(enc_tr.events) == 2 * len(recs)


def test_trace_pinpoints_divergence():
    a = trace.SymbolTrace()
    b = trace.SymbolTrace()
    a.record(0, 0, 0, "ptype", 0, 1, 100, 50)
    b.record(0, 0, 0, "ptype", 0, 2, 200, 50)
    d = trace.diff_traces(a, b)
    assert d is not None and d[0] == 0


def test_stage_timer():
    t = StageTimer()
    with t.stage("encode"):
        pass
    with t.stage("encode"):
        pass
    rep = t.report()
    assert rep["encode"]["calls"] == 2


def test_settings_roundtrip(tmp_path, monkeypatch):
    p = str(tmp_path / "settings.json")
    save_settings({"kf_interval": 123, "loss": 2, "bogus": 9}, p)
    vals = load_settings(p)
    assert vals["kf_interval"] == 123 and vals["loss"] == 2
    assert "bogus" not in vals
    monkeypatch.setenv("SPTC_LOSS", "3")
    monkeypatch.setenv("SPTC_SETTINGS", p)
    import screenpressor_tpu.utils.settings as s

    monkeypatch.setattr(s, "SETTINGS_PATH", p)
    cfg = make_config(64, 48)
    assert cfg.loss == 3  # env beats file
    assert cfg.kf_interval == 123
    cfg2 = make_config(64, 48, loss=0)
    assert cfg2.loss == 0  # kwargs beat env
