"""Utility tests: summaries, profiling hooks, artifacts, config round-trip."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eyediseasesegmentation_tpu import models as zoo
from eyediseasesegmentation_tpu.config import BaseConfig, TestConfig
from eyediseasesegmentation_tpu.utils import (log_pretty_table, make_logdir,
                                              minmax_normalize, save_output)
from eyediseasesegmentation_tpu.utils.summary import (cost_estimate,
                                                      get_num_parameters,
                                                      summarize)
from eyediseasesegmentation_tpu.utils.profiling import StepTimer, debug_nans


def test_config_json_roundtrip(tmp_path):
    cfg = BaseConfig(lesion_type="HE", criterion={"bce": 0.5, "dice": 0.5})
    cfg.to_json(tmp_path / "config.json")
    loaded = BaseConfig.from_json(tmp_path / "config.json")
    assert loaded.lesion_type == "HE"
    assert loaded.criterion == {"bce": 0.5, "dice": 0.5}
    # reflection API parity (reference config.py:185-196)
    attrs = loaded.get_all_attributes()
    assert attrs["model_name"] == "unetplusplusstar"
    t = TestConfig()
    assert t.get_all_attributes()["out_dir"] == "outputs"


def test_num_parameters_and_summary():
    model = zoo.get_model("classic_unet", {"filters": (8, 16)})
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=False)
    trainable, total = get_num_parameters(variables["params"])
    assert trainable == total > 1000
    table = summarize(model, (1, 32, 32, 3))
    assert "classic" in table.lower() or "params" in table.lower()


def test_cost_estimate():
    f = lambda a, b: a @ b
    a = jnp.zeros((128, 128)); b = jnp.zeros((128, 128))
    c = cost_estimate(f, a, b)
    assert c["flops"] >= 2 * 128 ** 3 * 0.9


def test_step_timer():
    t = StepTimer()
    t.tick(); t.tick(); t.tick()
    assert t.mean > 0
    assert t.rate(4) > 0


def test_debug_nans_context():
    with debug_nans(False):
        _ = jnp.log(jnp.asarray(-1.0))  # silently nan
    assert not jax.config.jax_debug_nans


def test_artifacts(tmp_path):
    save_output(np.random.rand(16, 16), tmp_path / "m.jpg")
    assert (tmp_path / "m.jpg").exists()
    d = make_logdir(tmp_path / "models", "IDRiD", "EX", "exp1")
    assert (d / "checkpoints").is_dir()
    table = log_pretty_table(["a", "b"], [[1, 2], [3, 4]])
    assert "| a" in table and "| 3" in table
    out = minmax_normalize(np.array([0.0, 255.0]))
    np.testing.assert_allclose(out, [0.0, 1.0])
