"""Utils: metrics logging, error tables, throughput meter, debug guards."""
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpe_tpu.utils import (MetricsLogger, Timer, nan_guard, seed_everything,
                           throughput_meter, write_error_table)


def test_metrics_logger_roundtrip():
    m = MetricsLogger("t")
    m.log(0, loss=1.0, mu=2.0)
    m.log(10, loss=0.5, mu=1.9)
    d = tempfile.mkdtemp()
    csv_path = m.to_csv(os.path.join(d, "m.csv"))
    jsonl_path = m.to_jsonl(os.path.join(d, "m.jsonl"))
    txt = open(csv_path).read()
    assert "loss" in txt and "0.5" in txt
    assert len(open(jsonl_path).readlines()) == 2


def test_write_error_table():
    d = tempfile.mkdtemp()
    rows = [{"method": "pl_pinn", "mode": 0, "mu": 1.001, "mu_ref": 1.0},
            {"method": "vanilla", "mode": 0, "mu": 1.08, "mu_ref": 1.0}]
    csv_path, tex_path = write_error_table(rows, d)
    txt = open(csv_path).read()
    assert "abs_error" in txt and "rel_error_pct" in txt
    assert "\\begin{tabular}" in open(tex_path).read()


def test_throughput_meter():
    f = jax.jit(lambda x: jnp.sum(x * x))
    x = jnp.ones((1024,))
    out = throughput_meter(f, (x,), n_points=1024, warmup=1, iters=3)
    assert out["pts_per_sec"] > 0


def test_timer():
    import time
    with Timer() as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01


def test_seed_everything():
    k = seed_everything(42)
    a = np.random.rand()
    seed_everything(42)
    assert np.random.rand() == a
    assert k.shape == (2,)


def test_nan_guard():
    with pytest.raises(FloatingPointError):
        with nan_guard():
            # fresh jitted fn → fresh compile under jax_debug_nans (a cached
            # executable from other tests would bypass the nan check)
            jax.jit(lambda x: jnp.log(x) * 3.0)(jnp.zeros(()) - 1.0).block_until_ready()
