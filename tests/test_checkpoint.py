import numpy as np

from consistent__style_transfer_tpu.train.checkpoint import StateCheckpointer
from consistent__style_transfer_tpu.train.loop import EarlyStopper
from consistent__style_transfer_tpu.train.state import (
    AsyncSaver,
    BestKeeper,
    load_params,
    newest_checkpoint,
    save_params,
)


def test_state_checkpointer_roundtrip(tmp_path):
    ckpt = StateCheckpointer(str(tmp_path / "ck"))
    payload = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "epoch": 3,
        "best": 1.25,
    }
    ckpt.save(3, payload)
    assert ckpt.latest_step() == 3
    template = {
        "params": {"w": np.zeros((2, 3), np.float32)},
        "epoch": 0,
        "best": 0.0,
    }
    restored = ckpt.restore(template)
    np.testing.assert_array_equal(restored["params"]["w"], payload["params"]["w"])
    assert int(restored["epoch"]) == 3
    assert float(restored["best"]) == 1.25
    ckpt.close()


def test_state_checkpointer_retention(tmp_path):
    ckpt = StateCheckpointer(str(tmp_path / "ck"), max_to_keep=1)
    for step in (0, 1, 2):
        ckpt.save(step, {"x": np.array([step], np.int32)})
    assert ckpt.latest_step() == 2
    restored = ckpt.restore({"x": np.zeros(1, np.int32)})
    assert restored["x"][0] == 2
    ckpt.close()


def test_best_keeper_delete_previous(tmp_path):
    keeper = BestKeeper("min")
    p = {"w": np.ones(2, np.float32)}
    a = str(tmp_path / "G_epoch_0.msgpack")
    b = str(tmp_path / "G_epoch_1.msgpack")
    assert keeper.update(2.0, p, a, delete_previous=True)
    assert not keeper.update(3.0, p, b, delete_previous=True)  # worse: no save
    import os

    assert os.path.exists(a) and not os.path.exists(b)
    assert keeper.update(1.0, p, b, delete_previous=True)
    assert os.path.exists(b) and not os.path.exists(a)  # previous best deleted
    assert newest_checkpoint(str(tmp_path)) == b


def test_best_keeper_async_saver(tmp_path):
    """The overlapped-save path (BestKeeper + AsyncSaver worker thread) must
    produce the same disk state as the synchronous path, including the
    previous-best delete, once drained (train/optimize.py epoch end)."""
    import os

    saver = AsyncSaver()
    keeper = BestKeeper("min", saver=saver)
    p = {"w": np.ones(2, np.float32)}
    a = str(tmp_path / "G_epoch_0.msgpack")
    b = str(tmp_path / "G_epoch_1.msgpack")
    assert keeper.update(2.0, p, a, delete_previous=True)
    assert not keeper.update(3.0, p, b, delete_previous=True)
    assert keeper.update(1.0, {"w": 2 * np.ones(2, np.float32)}, b,
                         delete_previous=True)
    saver.close()
    assert os.path.exists(b) and not os.path.exists(a)
    restored = load_params(b, {"w": np.zeros(2, np.float32)})
    np.testing.assert_array_equal(restored["w"], 2 * np.ones(2, np.float32))


def test_async_saver_reraises_worker_errors(tmp_path):
    import os

    import pytest

    saver = AsyncSaver()
    as_dir = str(tmp_path / "p.msgpack")
    os.makedirs(as_dir)  # open(path, "wb") on a directory raises in-worker
    saver.submit({"w": np.ones(2)}, as_dir)
    with pytest.raises(OSError):
        saver.close()


def test_save_load_params_roundtrip(tmp_path):
    p = {"a": np.arange(4, dtype=np.float32), "b": {"c": np.eye(2, dtype=np.float32)}}
    path = str(tmp_path / "p.msgpack")
    save_params(p, path)
    restored = load_params(path, {"a": np.zeros(4, np.float32),
                                  "b": {"c": np.zeros((2, 2), np.float32)}})
    np.testing.assert_array_equal(restored["a"], p["a"])
    np.testing.assert_array_equal(restored["b"]["c"], p["b"]["c"])


def test_early_stopper_patience():
    s = EarlyStopper(patience=1)
    assert not s.update(1.0)   # improves vs inf
    assert not s.update(1.5)   # first bad
    assert s.update(1.6)       # second bad -> stop
    s2 = EarlyStopper(patience=1)
    assert not s2.update(1.0)
    assert not s2.update(1.5)
    assert not s2.update(0.5)  # recovery resets
    assert not s2.update(0.9)


def test_load_params_with_eval_shape_template():
    """Checkpoint templates may be abstract (jax.eval_shape) trees — the
    production loaders use them to skip the op-by-op device init replay
    (train/optimize.py::load_frozen / load_generator_params)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from consistent__style_transfer_tpu.train.state import load_params, save_params

    def init():
        return {"params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                           "b": jnp.ones((3,), jnp.float32)}}

    real = init()
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/p.msgpack"
        save_params(real, path)
        abstract = jax.eval_shape(init)
        loaded = load_params(path, abstract)
    assert np.allclose(loaded["params"]["w"], np.arange(6).reshape(2, 3))
    assert np.allclose(loaded["params"]["b"], 1.0)
    # restored leaves are concrete arrays, not ShapeDtypeStructs
    assert all(hasattr(x, "dtype") and not isinstance(x, jax.ShapeDtypeStruct)
               for x in jax.tree.leaves(loaded))
