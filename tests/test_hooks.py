"""Hook-engine tests: registration, call order, defaults, checkpoint retention.

Reference behavior: detectron2 HookBase + PTrainer.build_hooks
(``/root/reference/pt/engine/trainer.py:498-547``) — before/after_step around
every iteration, after_* in reverse registration order, user hooks addable
without editing the trainer.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from synthetic_data import CLASSES, make_voc_dataset  # noqa: E402

from probabilisticteacher_tpu.data.datasets import register_pascal_voc  # noqa: E402
from probabilisticteacher_tpu.engine.hooks import (EvalHook, HookBase,  # noqa: E402
                                                   IterationTimer,
                                                   PeriodicCheckpointer,
                                                   PeriodicWriter)


class _Recorder(HookBase):
    def __init__(self, log, tag):
        self.log = log
        self.tag = tag

    def before_train(self):
        self.log.append((self.tag, "before_train"))

    def after_train(self):
        self.log.append((self.tag, "after_train"))

    def before_step(self):
        self.log.append((self.tag, "before_step", self.trainer.iter))

    def after_step(self):
        self.log.append((self.tag, "after_step", self.trainer.iter))


@pytest.mark.slow
def test_custom_hooks_called_in_order(tmp_path):
    from test_e2e import micro_cfg

    root = str(tmp_path / "voc")
    make_voc_dataset(os.path.join(root, "src"), "train", num_images=4, seed=0)
    make_voc_dataset(os.path.join(root, "tgt"), "train", num_images=4, seed=1)
    make_voc_dataset(os.path.join(root, "val"), "val", num_images=2, seed=2)
    register_pascal_voc("hooks_l", os.path.join(root, "src"), "train", CLASSES)
    register_pascal_voc("hooks_u", os.path.join(root, "tgt"), "train", CLASSES)
    register_pascal_voc("hooks_v", os.path.join(root, "val"), "val", CLASSES)
    cfg = micro_cfg(str(tmp_path), "hooks_l", "hooks_u", "hooks_v")
    cfg.SOLVER.MAX_ITER = 2
    cfg.UNSUPNET.BURN_UP_STEP = 1
    cfg.TEST.EVAL_PERIOD = 0       # isolate hook mechanics from eval cost
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.freeze()

    from probabilisticteacher_tpu.engine.trainer import PTrainer

    trainer = PTrainer(cfg)
    # default hooks present and typed
    kinds = [type(h).__name__ for h in trainer._hooks]
    assert "IterationTimer" in kinds and "PeriodicWriter" in kinds
    assert "PeriodicCheckpointer" in kinds and "EvalHook" in kinds

    log = []
    trainer.register_hooks([_Recorder(log, "a"), _Recorder(log, "b")])
    trainer.train()

    assert ("a", "before_train") in log and ("b", "after_train") in log
    steps_a = [e for e in log if e[0] == "a" and e[1] == "before_step"]
    assert [e[2] for e in steps_a] == [0, 1]
    # after_step runs in REVERSE registration order: b before a
    i_b = log.index(("b", "after_step", 0))
    i_a = log.index(("a", "after_step", 0))
    assert i_b < i_a
    # it/s emitted by IterationTimer
    assert any(k == "it/s" for k in trainer.storage._latest)

    # "lr" is in every write, like detectron2's LRScheduler hook (the schedule
    # itself advances in-graph; the writer reads the precomputed host table)
    import json

    from probabilisticteacher_tpu.solver import build_lr_schedule

    with open(os.path.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    lr_recs = [r for r in recs if "lr" in r]
    assert lr_recs, "PeriodicWriter should report lr"
    r = lr_recs[-1]
    expect = float(build_lr_schedule(cfg)(np.float32(r["iteration"])))
    assert r["lr"] == pytest.approx(expect, rel=1e-5)


def test_checkpoint_retention(tmp_path):
    import jax.numpy as jnp

    from probabilisticteacher_tpu.checkpoint import (latest_checkpoint,
                                                     save_checkpoint)

    class S:
        pass

    def mk_state(step):
        from probabilisticteacher_tpu.engine.steps import TrainState

        p = {"w": np.zeros((2,), np.float32)}
        return TrainState(step=jnp.asarray(step, jnp.int32), student=p,
                          teacher=p, opt_state={})

    out = str(tmp_path / "ckpts")
    os.makedirs(out)
    for s in (1, 2, 3, 4):
        save_checkpoint(out, mk_state(s), keep=2)
    kept = sorted(d for d in os.listdir(out) if d.startswith("model_"))
    assert kept == ["model_0000003", "model_0000004"]
    assert latest_checkpoint(out).endswith("model_0000004")


def test_best_checkpointer(tmp_path):
    """BestCheckpointer saves model_best only on metric improvement and never
    touches the last_checkpoint marker (resume follows periodic saves)."""
    import jax.numpy as jnp

    from probabilisticteacher_tpu.engine.hooks import BestCheckpointer
    from probabilisticteacher_tpu.engine.steps import TrainState
    from probabilisticteacher_tpu.events import EventStorage

    out = str(tmp_path / "run")
    os.makedirs(out)

    class Cfg:
        OUTPUT_DIR = out

    class T:
        cfg = Cfg()
        storage = EventStorage()
        iter = 0
        state = TrainState(step=jnp.asarray(0, jnp.int32),
                           student={"w": np.zeros((2,), np.float32)},
                           teacher={"w": np.zeros((2,), np.float32)}, opt_state={})

    t = T()
    h = BestCheckpointer(eval_period=10, metric="mAP50")
    h.trainer = t

    best_dir = os.path.join(out, "model_best")
    t.iter = 10
    h.before_step()                      # no metric yet -> nothing saved
    assert not os.path.exists(best_dir)

    t.storage.put_scalars(mAP50=30.0)
    h.before_step()
    assert os.path.exists(best_dir)
    assert h.best == 30.0

    mt0 = os.path.getmtime(best_dir)
    t.storage.put_scalars(mAP50=20.0)    # worse -> no overwrite
    t.iter = 20
    h.before_step()
    assert h.best == 30.0

    t.storage.put_scalars(mAP50=44.0)    # better -> overwrite
    h.after_train()
    assert h.best == 44.0
    # periodic-resume marker untouched by best saves
    assert not os.path.exists(os.path.join(out, "last_checkpoint"))


def _mini_trainer(tmp_path):
    """Minimal trainer stand-in for host-side hook logic."""
    import jax.numpy as jnp

    from probabilisticteacher_tpu.engine.steps import TrainState
    from probabilisticteacher_tpu.events import EventStorage

    out = str(tmp_path / "run")
    os.makedirs(out, exist_ok=True)

    class Cfg:
        OUTPUT_DIR = out

    class T:
        cfg = Cfg()
        storage = EventStorage()
        iter = 0
        writers = []
        state = TrainState(step=jnp.asarray(0, jnp.int32),
                           student={"w": np.zeros((2,), np.float32)},
                           teacher={"w": np.zeros((2,), np.float32)}, opt_state={})

    return T()


def test_divergence_guard_raises_on_nonfinite_loss(tmp_path):
    """Reference parity: a non-finite total loss aborts the run with
    FloatingPointError (detectron2 _write_metrics via pt/engine/trainer.py:
    394-429) instead of silently burning the 30k-iter budget."""
    from probabilisticteacher_tpu.engine.hooks import DivergenceGuardHook

    t = _mini_trainer(tmp_path)
    h = DivergenceGuardHook()
    h.trainer = t

    h.after_step()                        # nothing written yet -> no-op
    t.storage.iter = 20
    t.storage.put_scalars(total_loss=1.5)
    t.iter = 21
    h.after_step()                        # finite -> passes

    t.storage.iter = 40
    t.storage.put_scalars(total_loss=float("nan"))
    t.iter = 41
    with pytest.raises(FloatingPointError, match="iteration 40"):
        h.after_step()

    # +inf diverges too
    t2 = _mini_trainer(tmp_path)
    h2 = DivergenceGuardHook()
    h2.trainer = t2
    t2.storage.iter = 20
    t2.storage.put_scalars(total_loss=float("inf"))
    with pytest.raises(FloatingPointError):
        h2.after_step()


def test_divergence_guard_checks_each_write_once(tmp_path):
    """A stale (already-checked) value is not re-fetched or re-raised —
    freshness is tracked via EventStorage.iter_of."""
    from probabilisticteacher_tpu.engine.hooks import DivergenceGuardHook

    t = _mini_trainer(tmp_path)
    h = DivergenceGuardHook()
    h.trainer = t
    t.storage.iter = 20
    t.storage.put_scalars(total_loss=2.0)
    h.after_step()
    assert h._checked_iter == 20
    for t.iter in (21, 22, 23):          # no new writes -> no new checks
        h.after_step()
    assert h._checked_iter == 20


def test_teacher_health_pseudo_cliff(tmp_path):
    """>50% drop of num_pseudo_boxes below its trailing median flags the run,
    writes health/collapse_flag, and saves a one-time forensic checkpoint."""
    from probabilisticteacher_tpu.engine.hooks import TeacherHealthHook

    t = _mini_trainer(tmp_path)
    h = TeacherHealthHook(eval_period=0, pseudo_drop=0.5, map_drop=0.0,
                          min_history=5)
    h.trainer = t

    for i, v in enumerate([20.0, 22.0, 21.0, 19.0, 20.0, 21.0]):
        t.storage.iter = 20 * (i + 1)
        t.storage.put_scalars(num_pseudo_boxes=v)
        t.iter = t.storage.iter + 1
        h.after_step()
    assert "health/collapse_flag" not in t.storage.latest()

    t.storage.iter = 200
    t.storage.put_scalars(num_pseudo_boxes=4.0)   # cliff: 80% below median 20
    t.iter = 201
    h.after_step()
    assert t.storage.latest()["health/collapse_flag"] == 1.0
    assert os.path.exists(os.path.join(t.cfg.OUTPUT_DIR, "model_health"))

    # second trigger: flag again but no second checkpoint churn
    mt0 = os.path.getmtime(os.path.join(t.cfg.OUTPUT_DIR, "model_health"))
    t.storage.iter = 220
    t.storage.put_scalars(num_pseudo_boxes=3.0)
    t.iter = 221
    h.after_step()
    assert os.path.getmtime(
        os.path.join(t.cfg.OUTPUT_DIR, "model_health")) == mt0


def test_teacher_health_map_drop(tmp_path):
    """Teacher mAP50 falling >threshold points between consecutive evals
    triggers the collapse flag (the round-4 signature: 64.8 -> 28.5)."""
    from probabilisticteacher_tpu.engine.hooks import TeacherHealthHook

    t = _mini_trainer(tmp_path)
    h = TeacherHealthHook(eval_period=10, pseudo_drop=0.0, map_drop=15.0)
    h.trainer = t

    t.storage.iter = 9
    t.storage.put_scalars(mAP50=64.8)
    t.iter = 9                            # eval fired at (9+1) % 10 == 0
    h.after_step()
    assert "health/collapse_flag" not in t.storage.latest()

    t.storage.iter = 19
    t.storage.put_scalars(mAP50=60.0)     # -4.8: within tolerance
    t.iter = 19
    h.after_step()
    assert "health/collapse_flag" not in t.storage.latest()

    t.storage.iter = 29
    t.storage.put_scalars(mAP50=28.5)     # -31.5: collapse
    t.iter = 29
    h.after_step()
    assert t.storage.latest()["health/collapse_flag"] == 1.0


def test_health_hooks_registered_by_default(tmp_path):
    """build_hooks wires both guards in by default, ahead of the writer so
    their after_step sees fresh values (reverse-order execution)."""
    from test_e2e import micro_cfg

    root = str(tmp_path / "voc")
    make_voc_dataset(os.path.join(root, "src"), "train", num_images=4, seed=0)
    make_voc_dataset(os.path.join(root, "tgt"), "train", num_images=4, seed=1)
    make_voc_dataset(os.path.join(root, "val"), "val", num_images=2, seed=2)
    register_pascal_voc("hh_l", os.path.join(root, "src"), "train", CLASSES)
    register_pascal_voc("hh_u", os.path.join(root, "tgt"), "train", CLASSES)
    register_pascal_voc("hh_v", os.path.join(root, "val"), "val", CLASSES)
    cfg = micro_cfg(str(tmp_path), "hh_l", "hh_u", "hh_v")
    cfg.freeze()

    from probabilisticteacher_tpu.engine.trainer import PTrainer

    trainer = PTrainer(cfg)
    kinds = [type(h).__name__ for h in trainer._hooks]
    assert "DivergenceGuardHook" in kinds and "TeacherHealthHook" in kinds
    assert kinds.index("DivergenceGuardHook") < kinds.index("PeriodicWriter")
    assert kinds.index("TeacherHealthHook") < kinds.index("EvalHook")

    # opting out removes them
    cfg2 = micro_cfg(str(tmp_path), "hh_l", "hh_u", "hh_v")
    cfg2.UNSUPNET.ABORT_ON_NONFINITE = False
    cfg2.UNSUPNET.HEALTH_PSEUDO_DROP = 0.0
    cfg2.UNSUPNET.HEALTH_MAP_DROP = 0.0
    cfg2.freeze()
    kinds2 = [type(h).__name__ for h in PTrainer(cfg2)._hooks]
    assert "DivergenceGuardHook" not in kinds2
    assert "TeacherHealthHook" not in kinds2


def test_memory_guard_hook(tmp_path):
    """Above the RSS limit: checkpoint written, SystemExit(75) raised."""
    import jax.numpy as jnp
    import pytest

    from probabilisticteacher_tpu.engine.hooks import MemoryGuardHook
    from probabilisticteacher_tpu.engine.steps import TrainState
    from probabilisticteacher_tpu.events import EventStorage

    out = str(tmp_path / "run")
    os.makedirs(out)

    class Cfg:
        OUTPUT_DIR = out

    class T:
        cfg = Cfg()
        storage = EventStorage()
        iter = 0
        writers = []
        state = TrainState(step=jnp.asarray(7, jnp.int32),
                           student={"w": np.zeros((2,), np.float32)},
                           teacher={"w": np.zeros((2,), np.float32)}, opt_state={})

    assert MemoryGuardHook.rss_kb() > 0  # /proc readable

    h = MemoryGuardHook(limit_gb=10_000.0, period=1)  # huge limit: no trip
    h.trainer = T()
    h.after_step()

    h = MemoryGuardHook(limit_gb=0.0001, period=1)    # 100 KB: trips
    h.trainer = T()
    with pytest.raises(SystemExit) as e:
        h.after_step()
    assert e.value.code == 75
    assert os.path.exists(os.path.join(out, "model_0000007"))
    assert os.path.exists(os.path.join(out, "last_checkpoint"))


def test_supervise_restarts_on_75(monkeypatch):
    """supervise() relaunches with --resume on exit 75, stops otherwise."""
    import train_net

    calls = []
    rcs = iter([75, 75, 0])

    def fake_call(cmd):
        calls.append(cmd)
        return next(rcs)

    monkeypatch.setattr("subprocess.call", fake_call)
    rc = train_net.supervise(["--supervise", "--config-file", "x.yaml", "K", "V"])
    assert rc == 0
    assert len(calls) == 3
    assert "--supervise" not in calls[0]
    assert "--resume" not in calls[0]
    # --resume must precede the positional KEY VALUE overrides (nargs=REMAINDER
    # would swallow an appended flag into the override list; the live run_r
    # restart at iter 2350 crashed on exactly that before the ordering fix)
    for c in (calls[1], calls[2]):
        assert c.count("--resume") == 1
        assert c.index("--resume") < c.index("K")
