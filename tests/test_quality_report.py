"""quality_report.py renders the unattended quality-run evidence into docs —
a renderer bug would silently mangle docs/benchmarks.md at the end of a
multi-hour run, so pin the contract: row rendering, count-weighted zoo
aggregation, incomplete-stage notes, and marker-block targeting."""

import importlib.util
import json

import pytest

SCRIPTS = "/root/repo/scripts"


def _load():
    spec = importlib.util.spec_from_file_location(
        "quality_report", f"{SCRIPTS}/quality_report.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def out_dir(tmp_path):
    out = tmp_path / "quality_mini"
    out.mkdir()
    (out / "results_rule.json").write_text(json.dumps(
        {"merged": {"hit@1": 0.01, "hit@5": 0.05, "hit@10": 0.1,
                    "recall@10": 0.04, "ndcg@10": 0.03}}))
    (out / "results_qwen3multi.json").write_text(json.dumps(
        {"merged": {"hit@1": 0.02, "hit@5": 0.1, "hit@10": 0.2,
                    "recall@10": 0.08, "ndcg@10": 0.06}}))
    rec = out / "rec_SASRec"
    rec.mkdir()
    # two behaviors with different counts: merged metric is count-weighted
    (rec / "SVADM_SASRec.json").write_text(json.dumps(
        {"click": {"hit@10": 0.2, "count": 300},
         "buy": {"hit@10": 0.1, "count": 100}}))
    return out


def test_render_and_write(out_dir, tmp_path):
    doc = tmp_path / "benchmarks.md"
    doc.write_text("intro\n<!-- quality-mini-results:begin -->\nold\n"
                   "<!-- quality-mini-results:end -->\nfooter\n")
    mod = _load()
    mod.OUT = str(out_dir)
    mod.WRITE = True
    mod.MARKER = "quality-mini-results"
    mod.main(doc=str(doc))
    text = doc.read_text()
    assert "old" not in text
    assert text.startswith("intro\n") and text.rstrip().endswith("footer")
    # generative rows rendered with 4-decimal cells
    assert "| rule floor (repeat history, unique) | 0.0100 | " in text
    assert "**Qwen3Multi (flagship, full budget)** | 0.0200 |" in text
    # no tokenizer-ablation results -> explicit note, never a bare header table
    assert "_stage not complete — no results yet_" in text
    # zoo aggregation: (0.2*300 + 0.1*100) / 400 = 0.175
    assert "| SASRec | " in text and "0.1750" in text


def test_marker_selection_by_dir(monkeypatch):
    # the mini OUT dir routes to its own marker block so small-scale numbers
    # can never overwrite the flagship tables; any other dir hits the
    # flagship block
    import sys

    monkeypatch.setattr(sys, "argv",
                        ["quality_report.py", "/x/runs/quality_mini", "--write"])
    assert _load().MARKER == "quality-mini-results"
    monkeypatch.setattr(sys, "argv",
                        ["quality_report.py", "/x/runs/quality_r3"])
    assert _load().MARKER == "quality-results"
