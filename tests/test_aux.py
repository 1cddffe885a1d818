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


class TestAotExportCache:
    """zeggs_tpu/train/aot.py: trace-skipping export artifacts (VERDICT r4
    item 2 — tracing measured 47 s of every cold train-bench process)."""

    def test_roundtrip_and_fingerprint_invalidation(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from zeggs_tpu.train import aot
        from zeggs_tpu.train.radam import RAdamState

        def step(params, opt, x):
            p2 = jax.tree.map(lambda a: a - 0.1 * x.mean() * a, params)
            o2 = RAdamState(opt.step + 1, opt.exp_avg, opt.exp_avg_sq)
            return p2, o2, {"loss": x.sum()}

        jstep = jax.jit(step, donate_argnums=(0, 1))
        params = {"w": jnp.ones((4, 4))}
        opt = RAdamState(jnp.zeros((), jnp.int32), {"w": jnp.zeros((4, 4))},
                         {"w": jnp.zeros((4, 4))})
        x = jnp.ones((2, 2))

        call, info = aot.cached_export("t", jstep, (params, opt, x),
                                       extra=("a",), cache_dir=tmp_path)
        assert info["aot"] == "exported"
        p2, o2, m = call(params, opt, x)
        assert float(m["loss"]) == 4.0
        assert isinstance(o2, RAdamState) and int(o2.step) == 1

        # second load: deserialize path, tracing skipped, same results
        call2, info2 = aot.cached_export("t", jstep, (params, opt, x),
                                         extra=("a",), cache_dir=tmp_path)
        assert info2["aot"] == "deserialized"
        _, o2b, m2 = call2(params, opt, x)
        assert float(m2["loss"]) == 4.0 and int(o2b.step) == 1

        # different extras -> different fingerprint -> fresh export, and the
        # stale artifact for the same name is pruned
        _, info3 = aot.cached_export("t", jstep, (params, opt, x),
                                     extra=("b",), cache_dir=tmp_path)
        assert info3["aot"] == "exported"
        assert len(list(tmp_path.glob("t-*.jaxexport"))) == 1

    def test_source_fingerprint_stable_within_process(self):
        from zeggs_tpu.train import aot

        assert aot.source_fingerprint(("x",)) == aot.source_fingerprint(("x",))
        assert aot.source_fingerprint(("x",)) != aot.source_fingerprint(("y",))
