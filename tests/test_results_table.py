"""results_table CLI: mechanical rendering of final_metrics.json files into
the reference README's results table (reference README.md:36-45), including
label matching + Δ rows against the reference's shipped metrics tree."""

import json
import os

from tss_dprnn_tpu.cli import results_table as rt


def _write(path, payload):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def test_label_matches_between_ours_and_reference(tmp_path):
    ours = _write(str(tmp_path / "results/dprnn-spe/final_metrics_attention.json"),
                  {"si_sdr": 13.3})
    ref = _write(str(tmp_path / "refmetrics/dprnn-spe/final_metrics_attention.json"),
                 {"si_sdr": 13.29})
    assert rt._label(ours) == rt._label(ref) == "dprnn-spe attention"
    bss = _write(str(tmp_path / "results/dprnn-tasnet/final_metrics.json"), {})
    assert rt._label(bss) == "dprnn-tasnet"


def test_render_with_reference_delta(tmp_path):
    p = _write(str(tmp_path / "results/dprnn-spe/final_metrics_attention.json"),
               {"si_sdr": 13.50, "si_sdr_imp": 13.4, "pesq": None, "stoi": 0.9})
    rows = rt.load_rows([p])
    refs = [("dprnn-spe attention",
             {"si_sdr": 13.29, "si_sdr_imp": 13.2, "pesq": 2.99, "stoi": 0.898})]
    out = rt.render(rows, reference_rows=refs)
    lines = out.splitlines()
    assert lines[0] == "| model | SI-SDR | SI-SDRi | PESQ | STOI |"
    assert lines[2] == "| dprnn-spe attention | 13.50 | 13.40 | — | 0.900 |"
    # pesq is None on our side -> no delta for it; si_sdr delta +0.21
    assert lines[3] == "| ↳ Δ vs reference | +0.21 | +0.20 | — | +0.00 |"


def test_reference_rows_walk_and_cli(tmp_path, capsys, monkeypatch):
    root = str(tmp_path / "metrics")
    _write(os.path.join(root, "dprnn-tasnet/final_metrics.json"),
           {"si_sdr": 15.76, "pesq": 3.15, "stoi": 0.939})
    _write(os.path.join(root, "dprnn-spe/final_metrics_FiLM.json"),
           {"si_sdr": 12.97, "pesq": 2.97, "stoi": 0.891})
    rows = rt.reference_rows(root)
    assert sorted(r[0] for r in rows) == ["dprnn-spe FiLM", "dprnn-tasnet"]

    ours = _write(str(tmp_path / "out/dprnn-tasnet/final_metrics.json"),
                  {"si_sdr": 15.9, "si_sdr_imp": 15.8, "pesq": 3.1, "stoi": 0.94})
    monkeypatch.setattr(rt, "REFERENCE_METRICS", root)
    rt.main(["--compare-reference", ours])
    out = capsys.readouterr().out
    assert "| dprnn-tasnet | 15.90 | 15.80 | 3.10 | 0.940 |" in out
    assert "| ↳ Δ vs reference | +0.14 | — | -0.05 | +0.00 |" in out
