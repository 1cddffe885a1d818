"""Aux subsystems: profiling harness, dataset stats table, orbax checkpoints."""

import numpy as np

import jax
import jax.numpy as jnp

from zeggs_tpu.io import checkpoint
from zeggs_tpu.utils import profiling


def test_time_fn():
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128, 128))
    stats = profiling.time_fn(f, x, iters=3, warmup=1)
    assert stats["median_s"] > 0
    assert len(stats["times"]) == 3


def test_trace_writes_events(tmp_path):
    with profiling.trace(tmp_path):
        with profiling.annotate("region"):
            jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
    # a plugins/profile dir with at least one trace artifact appears
    found = list(tmp_path.rglob("*.trace.json.gz")) + list(tmp_path.rglob("*.xplane.pb"))
    assert found


def test_orbax_roundtrip(tmp_path):
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.full((), 7, np.int32)}
    checkpoint.save_orbax(tmp_path / "ck", 7, state)
    restored, step = checkpoint.load_orbax(tmp_path / "ck", template=state)
    assert step == 7
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])


def test_dataset_stats_table_smoke(tmp_path):
    # minimal fake dataset object
    from zeggs_tpu.data.dataset import dataset_stats_table

    class DS:
        label_names = ["A", "B"]
        ranges_train = np.array([[0, 120], [120, 300]])
        ranges_train_labels = np.array([0, 1])
        ranges_valid = np.array([[300, 360]])
        ranges_valid_labels = np.array([0])

    out = dataset_stats_table(DS())
    assert "Data Info" in out and "TOTAL" in out and "A" in out
