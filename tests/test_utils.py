import json
import os

import jax
import jax.numpy as jnp

from semanticsegmentation_tensorflow_tpu.utils.logging import MetricsLogger
from semanticsegmentation_tensorflow_tpu.utils.profiling import Timer


def test_metrics_logger_jsonl(tmp_path):
    log = MetricsLogger(str(tmp_path), name="t")
    log.log(1, {"loss": 0.5, "miou": jnp.float32(0.25)})
    log.log(2, {"loss": 0.4})
    log.close()
    lines = open(tmp_path / "t.jsonl").read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 1 and rec["loss"] == 0.5 and rec["miou"] == 0.25
    assert "time" in rec


def test_timer_time_fn_returns_median_seconds():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((8, 8))
    t = Timer.time_fn(f, x, iters=5, warmup=1)
    assert 0 < t < 5.0


def test_timer_context():
    with Timer() as t:
        pass
    assert t.elapsed >= 0


def test_train_script_spatial_flag_parses():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.train import parse_args
    a = parse_args(["--spatial", "2", "--epochs", "1"])
    assert a.spatial == 2 and a.epochs == 1
    assert parse_args([]).spatial == 1
