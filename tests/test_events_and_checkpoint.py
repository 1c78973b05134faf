"""Host-side subsystem tests: EventStorage/writers and checkpoint idempotency."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from probabilisticteacher_tpu.checkpoint import (latest_checkpoint, load_checkpoint,
                                                 load_weights, save_checkpoint)
from probabilisticteacher_tpu.engine.steps import TrainState
from probabilisticteacher_tpu.events import ConsoleWriter, EventStorage, JSONWriter


def test_event_storage_medians_and_latest():
    s = EventStorage(window=3)
    for v in [1.0, 5.0, 3.0, 9.0]:
        s.put_scalars(loss=v)
    assert s.latest()["loss"] == 9.0
    assert s.medians()["loss"] == 5.0  # window keeps [5, 3, 9] -> median 5


def test_json_writer_appends_records(tmp_path):
    path = str(tmp_path / "m" / "metrics.json")
    w = JSONWriter(path)
    s = EventStorage()
    s.iter = 3
    s.put_scalars(loss_total=1.5, data_time=0.1)
    w.write(s)
    s.iter = 4
    s.put_scalars(loss_total=1.2)
    w.write(s)
    w.close()
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["iteration"] == 3 and recs[0]["loss_total"] == 1.5
    assert recs[1]["iteration"] == 4 and recs[1]["loss_total"] == 1.2


def test_console_writer_runs():
    s = EventStorage()
    s.iter = 10
    s.put_scalars(loss_total=0.5, lr=0.01)
    ConsoleWriter(max_iter=100).write(s)  # smoke: no exception


def _tiny_state(seed=0):
    k = jax.random.key(seed)
    params = {"w": jax.random.normal(k, (4, 4)), "b": jnp.zeros((4,))}
    return TrainState(
        step=jnp.asarray(7, jnp.int32),
        student=params,
        teacher=jax.tree.map(lambda x: x + 1.0, params),
        opt_state={"momentum": jax.tree.map(jnp.zeros_like, params)},
    )


def test_checkpoint_roundtrip_and_marker(tmp_path):
    out = str(tmp_path)
    state = _tiny_state()
    path = save_checkpoint(out, state)
    assert latest_checkpoint(out) == path

    fresh = jax.tree.map(jnp.zeros_like, state)._replace(step=jnp.asarray(0, jnp.int32))
    restored = load_checkpoint(path, fresh)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.student["w"]),
                               np.asarray(state.student["w"]))
    np.testing.assert_allclose(np.asarray(restored.teacher["w"]),
                               np.asarray(state.teacher["w"]))

    # a newer save wins the marker
    state2 = restored._replace(step=jnp.asarray(11, jnp.int32))
    path2 = save_checkpoint(out, state2)
    assert latest_checkpoint(out) == path2 and path2 != path


def test_load_weights_only(tmp_path):
    out = str(tmp_path)
    state = _tiny_state()
    path = save_checkpoint(out, state)
    fresh = _tiny_state(seed=1)
    loaded = load_weights(path, fresh)
    np.testing.assert_allclose(np.asarray(loaded.student["w"]),
                               np.asarray(state.student["w"]))
    # optimizer state untouched (weights-only semantics, trainer.py:483-486)
    np.testing.assert_allclose(np.asarray(loaded.opt_state["momentum"]["w"]),
                               np.asarray(fresh.opt_state["momentum"]["w"]))

def test_load_weights_relative_path(tmp_path, monkeypatch):
    """orbax rejects relative paths; loaders must absolutize (MODEL.WEIGHTS is
    routinely given relative on the CLI, e.g. .proxy_runs/.../model_0003000)."""
    out = str(tmp_path / "run")
    state = _tiny_state()
    path = save_checkpoint(out, state)
    monkeypatch.chdir(tmp_path)
    rel = os.path.relpath(path, str(tmp_path))
    loaded = load_weights(rel, _tiny_state(seed=1))
    np.testing.assert_allclose(np.asarray(loaded.student["w"]),
                               np.asarray(state.student["w"]))
    restored = load_checkpoint(rel, jax.tree.map(jnp.zeros_like, state))
    assert int(restored.step) == 7
