"""MB dataset builders + train/test_MB_decoder E2E."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from gamer_tpu.data.contract import DataFiles
from gamer_tpu.data.seq import MBExampleBuilder, SeqCorpus, filter_mb_examples
from gamer_tpu.data.smb import TokenLayout


@pytest.fixture(scope="module")
def mb_corpus(synth_dir):
    return SeqCorpus(DataFiles(synth_dir, "Synth"), multi_behavior=True)


class TestMBBuilder:
    def test_leave_two_out(self, mb_corpus):
        b = MBExampleBuilder(mb_corpus, TokenLayout(), max_his_len=8)
        test = b.build("test")
        assert len(test) == len(mb_corpus.users)
        for u, ex in enumerate(test[:5]):
            # target = very last interaction
            last = mb_corpus.user_items[u][-1]
            row = mb_corpus.item_codes[mb_corpus.item_rows(np.array([last]))][0]
            np.testing.assert_array_equal(ex.targets[0, 1:], row)

    def test_filter_target_drops_lower_level_duplicates(self, mb_corpus):
        b_nofilter = MBExampleBuilder(mb_corpus, TokenLayout(), max_his_len=0)
        b_filter = MBExampleBuilder(mb_corpus, TokenLayout(), max_his_len=0,
                                    filter_target=True)
        t1 = b_nofilter.build("train")
        t2 = b_filter.build("train")
        assert len(t1) == len(t2)
        assert sum(len(e.prompt) for e in t2) <= sum(len(e.prompt) for e in t1)

    def test_decoder_train_augment(self, mb_corpus):
        b = MBExampleBuilder(mb_corpus, TokenLayout(), max_his_len=8)
        base = b.build_decoder_train(augment=None)
        aug = b.build_decoder_train(augment=3)
        assert len(base) < len(aug) <= 4 * len(base)

    def test_filter_examples(self, mb_corpus):
        b = MBExampleBuilder(mb_corpus, TokenLayout(), max_his_len=8)
        test = b.build("test")
        parts = sum(len(filter_mb_examples(test, i))
                    for i in range(len(mb_corpus.behavior_names)))
        assert parts == len(test)


def test_mb_train_and_eval_cli(synth_dir, tmp_path):
    from main import main

    res = main(["train_MB_decoder", "--dataset", "Synth", "--data_path", synth_dir,
                "--tasks", "mb_explicit_decoder_2", "--backbone", "Qwen3",
                "--max_his_len", "6", "--epochs", "2", "--batch_size", "16",
                "--output_dir", str(tmp_path / "ckpt"), "--n_layers", "1",
                "--hidden_size", "16", "--model_max_length", "128"])
    assert res["history"][1]["train_loss"] < res["history"][0]["train_loss"]

    ev = main(["test_MB_decoder", "--dataset", "Synth", "--data_path", synth_dir,
               "--max_his_len", "6", "--test_task", "mb_explicit",
               "--ckpt_path", str(tmp_path / "ckpt"), "--num_beams", "4",
               "--test_batch_size", "8",
               "--results_file", str(tmp_path / "mb.json")])
    types = [r["eval_type"] for r in ev]
    assert types == ["Target Behavior", "Behavior Specific", "Behavior Item"]
    for r in ev:
        for k, v in r.items():
            if k != "eval_type":
                assert 0.0 <= v <= 1.0


def test_pbatransformer_mb_pipeline(synth_dir, tmp_path):
    """PBATransformer (Switch-MoE enc-dec) through MB train + eval."""
    from main import main

    res = main(["train_MB_decoder", "--dataset", "Synth", "--data_path", synth_dir,
                "--tasks", "mb_explicit_decoder", "--backbone", "PBATransformer",
                "--max_his_len", "6", "--epochs", "1", "--batch_size", "16",
                "--output_dir", str(tmp_path / "pba"), "--n_layers", "1",
                "--hidden_size", "32"])
    assert res["best_metric"] > 0
    ev = main(["test_MB_decoder", "--dataset", "Synth", "--data_path", synth_dir,
               "--max_his_len", "6", "--test_task", "mb_explicit",
               "--ckpt_path", str(tmp_path / "pba"), "--num_beams", "4",
               "--test_batch_size", "8",
               "--results_file", str(tmp_path / "pba.json")])
    # enc-dec runs Target Behavior + Behavior Specific modes
    types = [r["eval_type"] for r in ev]
    assert "Target Behavior" in types and "Behavior Specific" in types
