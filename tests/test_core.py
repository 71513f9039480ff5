"""Core runtime units: config, checkpoint, metrics, registry."""

import json

import numpy as np
import pytest

from gamer_tpu.core.checkpoint import CheckpointManager
from gamer_tpu.core.config import Config
from gamer_tpu.core.metrics import MetricWriter
from gamer_tpu.core.registry import Registry


class DemoConfig(Config):
    a: int = 1
    b: str = "x"
    c: list = None  # type: ignore[assignment]


class TestConfig:
    def test_roundtrip_with_unknown_keys(self, tmp_path):
        cfg = DemoConfig.from_dict({"a": 5, "b": "y", "unknown": 42})
        assert cfg.a == 5 and cfg.extra["unknown"] == 42
        path = cfg.save(str(tmp_path))
        loaded = DemoConfig.from_file(str(tmp_path))
        assert loaded.a == 5 and loaded.extra["unknown"] == 42
        with open(path) as f:
            assert json.load(f)["unknown"] == 42

    def test_replace_preserves_extra(self):
        cfg = DemoConfig.from_dict({"a": 1, "z": "keep"})
        cfg2 = cfg.replace(a=2)
        assert cfg2.a == 2 and cfg2.extra["z"] == "keep"


class TestCheckpoint:
    def test_save_restore_pytree(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                "nested": {"b": np.ones(4, np.int32)}}
        mgr.save("best", tree, {"epoch": 3, "metric": 0.5})
        assert mgr.exists("best")
        restored = mgr.restore("best", template=tree)
        np.testing.assert_array_equal(restored["w"], tree["w"])
        np.testing.assert_array_equal(restored["nested"]["b"], tree["nested"]["b"])
        assert mgr.metadata("best")["epoch"] == 3

    def test_overwrite(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.save("t", {"x": np.zeros(2)})
        mgr.save("t", {"x": np.ones(2)})
        np.testing.assert_array_equal(mgr.restore("t", template={"x": np.zeros(2)})["x"],
                                      np.ones(2))


class TestMetrics:
    def test_jsonl_stream(self, tmp_path):
        w = MetricWriter(str(tmp_path), run_name="r", config={"lr": 0.1})
        w.log({"loss": np.float32(1.5)}, step=1)
        w.log({"loss": 1.2, "acc": np.array(0.3)}, step=2)
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["loss"] == 1.5 and lines[0]["_step"] == 1
        assert lines[1]["acc"] == pytest.approx(0.3)
        cfg = json.load(open(tmp_path / "run_config.json"))
        assert cfg["lr"] == 0.1


class TestRegistry:
    def test_duplicate_rejected(self):
        r = Registry("demo")

        @r.register("a")
        class A:
            pass

        with pytest.raises(ValueError):
            @r.register("a")
            class B:
                pass

        with pytest.raises(KeyError):
            r.get("missing")
        assert r.get("a") is A
