"""Checkpoint roundtrip + metrics logger tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.core.checkpoint import (
    save_checkpoint, load_checkpoint, latest_step,
)
from tdnnf_nas_tpu.core.metrics import MetricsLogger
from tdnnf_nas_tpu.core.config import Config, asdict_config, config_from_dict
import dataclasses


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))},
        "step": jnp.asarray(7, jnp.int32),
    }
    d = str(tmp_path / "ck")
    save_checkpoint(d, 7, state, meta={"note": "x"})
    save_checkpoint(d, 8, state)
    save_checkpoint(d, 9, state)
    assert latest_step(d) == 9
    import os
    assert not os.path.exists(os.path.join(d, "ckpt_00000007.npz"))  # keep=2
    loaded, step, meta = load_checkpoint(d, state)
    assert step == 9
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))


def test_metrics_logger(tmp_path):
    log = MetricsLogger(str(tmp_path / "m.jsonl"))
    log.log(0, {"loss": 1.0})
    log.log(1, {"loss": jnp.asarray(0.5)})
    assert log.last("loss") == 0.5
    assert "loss" in log.report()
    log.close()
    import json
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[1]["loss"] == 0.5


def test_config_json_roundtrip():
    @dataclasses.dataclass(frozen=True)
    class Inner(Config):
        a: int = 1

    @dataclasses.dataclass(frozen=True)
    class Outer(Config):
        inner: Inner = dataclasses.field(default_factory=Inner)
        name: str = "x"
        vals: tuple = (1, 2)

    o = Outer(inner=Inner(a=5), name="y")
    d = asdict_config(o)
    o2 = config_from_dict(Outer, d)
    assert o2.inner.a == 5 and o2.name == "y" and tuple(o2.vals) == (1, 2)
