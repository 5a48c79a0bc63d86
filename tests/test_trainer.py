"""Trainer tests: loss decreases on a tiny overfit run, checkpoints
save/resume, schedules, end-to-end run_mmsft on synthetic data."""

import json
import os

import numpy as np
import pytest

from llamole_tpu.config import TrainingArguments
from llamole_tpu.train.trainer import create_optimizer, find_last_checkpoint
from llamole_tpu.train.workflow import run_mmsft
from tests.test_composite import SYNTH_RECORDS


def test_cosine_schedule():
    args = TrainingArguments(learning_rate=1e-3, warmup_ratio=0.1,
                             lr_scheduler_type="cosine")
    tx, schedule = create_optimizer(args, 100)
    assert float(schedule(0)) < 1e-4
    assert float(schedule(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(schedule(100)) < 1e-4


def test_find_last_checkpoint(tmp_path):
    assert find_last_checkpoint(str(tmp_path)) is None
    for n in (10, 200, 30):
        d = tmp_path / f"checkpoint-{n}"
        os.makedirs(d)
        (d / "trainable.msgpack").write_bytes(b"")
        (d / "trainer_state.json").write_text('{"step": %d}' % n)
    assert find_last_checkpoint(str(tmp_path)).endswith("checkpoint-200")
    # a crashed ASYNC orbax save (meta written, payload never committed)
    # must not win auto-resume
    d = tmp_path / "checkpoint-300"
    os.makedirs(d)
    (d / "trainer_state.json").write_text('{"step": 300, "backend": "orbax"}')
    assert find_last_checkpoint(str(tmp_path)).endswith("checkpoint-200")


@pytest.mark.slow
def test_run_mmsft_end_to_end(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "synth.json", "w") as f:
        json.dump(SYNTH_RECORDS * 2, f)
    out_dir = tmp_path / "out"
    args = {
        "model_name_or_path": "",
        "dataset": "synth",
        "dataset_dir": str(data_dir),
        "template": "default",
        "cutoff_len": 384,
        "learned_query_size": 8,
        "do_train": True,
        "output_dir": str(out_dir),
        "per_device_train_batch_size": 2,
        "gradient_accumulation_steps": 1,
        "learning_rate": 1e-3,
        "num_train_epochs": 2.0,
        "lr_scheduler_type": "cosine",
        "warmup_ratio": 0.1,
        "logging_steps": 1,
        "save_steps": 1000,
        "seed": 0,
        "finetuning_type": "lora",
        "lora_rank": 4,
        "overwrite_output_dir": True,
    }
    metrics = run_mmsft(args)
    assert np.isfinite(metrics["train_loss"])
    assert metrics["train_steps"] == 4  # 4 examples / bs 2 * 2 epochs
    # artifacts
    assert (out_dir / "adapter.msgpack").exists()
    assert (out_dir / "connector" / "graph_to_lm.msgpack").exists()
    assert (out_dir / "graphllm_config.json").exists()
    assert (out_dir / "trainer_log.jsonl").exists()
    assert (out_dir / "train_results.json").exists()
    # loss moved: first logged loss > last logged loss on overfit run
    recs = [json.loads(l) for l in open(out_dir / "trainer_log.jsonl")]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert len(losses) >= 4
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "synth.json", "w") as f:
        json.dump(SYNTH_RECORDS, f)
    out_dir = tmp_path / "out"
    base = {
        "model_name_or_path": "",
        "dataset": "synth", "dataset_dir": str(data_dir),
        "template": "default", "cutoff_len": 384,
        "do_train": True, "output_dir": str(out_dir),
        "per_device_train_batch_size": 2, "learning_rate": 1e-3,
        "num_train_epochs": 1.0, "save_steps": 1, "logging_steps": 1,
        "seed": 0, "lora_rank": 4, "overwrite_output_dir": True,
    }
    run_mmsft(base)
    last = find_last_checkpoint(str(out_dir))
    assert last is not None
    # resuming a COMPLETED run is a no-op (HF Trainer semantics: the
    # restored step already meets the budget), not a fresh epoch
    base2 = dict(base, overwrite_output_dir=False)
    metrics = run_mmsft(base2)
    assert metrics["train_steps"] == 1
    # extending the budget resumes from the checkpoint and trains only
    # the remaining steps
    base3 = dict(base, overwrite_output_dir=False, num_train_epochs=2.0)
    metrics = run_mmsft(base3)
    assert metrics["train_steps"] == 2


def test_epoch_batches_skip_matches_tail():
    """skip=k reproduces the uninterrupted stream minus its first k
    batches (the resume-data-order contract)."""
    from llamole_tpu.train.workflow import _epoch_batches

    inputs = [{"v": i} for i in range(7)]

    def collator(chunk):
        return {"rows": np.asarray([c["v"] for c in chunk])}

    full = list(_epoch_batches(inputs, collator, 2, 3.0, seed=3))
    for k in (1, 3, 4, len(full) - 1, len(full)):
        tail = list(_epoch_batches(inputs, collator, 2, 3.0, seed=3, skip=k))
        assert len(tail) == len(full) - k
        for a, b in zip(full[k:], tail):
            np.testing.assert_array_equal(a["rows"], b["rows"])


def test_interrupted_resume_equals_uninterrupted():
    """Gold resume test: train k steps, checkpoint, restore into a fresh
    trainer, finish the remaining steps on the skipped stream — final
    params must be bit-identical to one uninterrupted run."""
    import jax
    import jax.numpy as jnp

    from llamole_tpu.train.trainer import Trainer, TrainState

    def loss_fn(p, frozen, rng, batch):
        pred = batch["x"] @ p["w"] + p["b"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        aux = {"lm_loss": loss, "design_loss": 0.0, "retro_loss": 0.0}
        return loss, aux

    rng = np.random.RandomState(0)
    all_batches = [
        {"x": rng.randn(4, 3).astype(np.float32),
         "y": rng.randn(4, 2).astype(np.float32),
         "attention_mask": np.ones((4, 3), np.int32)}
        for _ in range(6)
    ]
    args = TrainingArguments(learning_rate=1e-2, lr_scheduler_type="cosine",
                             warmup_ratio=0.0, logging_steps=100,
                             gradient_accumulation_steps=2)
    params0 = {"w": jnp.zeros((3, 2)), "b": jnp.zeros((2,))}
    total = len(all_batches)

    def fresh():
        tr = Trainer(loss_fn, frozen={}, args=args, num_training_steps=total // 2)
        st = tr.init_state(jax.tree.map(jnp.copy, params0), seed=0)
        return tr, st

    # uninterrupted
    tr_a, st_a = fresh()
    st_a, _ = tr_a.train(st_a, iter(all_batches), total)

    # interrupted after k: feed only the first k batches, checkpoint,
    # then a NEW trainer restores and consumes the remaining stream
    k = 3
    tr_b, st_b = fresh()
    st_b, _ = tr_b.train(st_b, iter(all_batches[:k]), total)
    assert st_b.step == k
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        tr_b.save_checkpoint(st_b, d)
        tr_c, st_c = fresh()
        st_c = tr_c.load_checkpoint(st_c, d)
        st_c, metrics = tr_c.train(st_c, iter(all_batches[k:]), total)
    assert st_c.step == total == st_a.step
    jax.tree.map(np.testing.assert_array_equal, st_a.params, st_c.params)
    # and a full-budget checkpoint resumes as a no-op
    with tempfile.TemporaryDirectory() as d:
        tr_c.save_checkpoint(st_c, d)
        tr_d, st_d = fresh()
        st_d = tr_d.load_checkpoint(st_d, d)
        st_d, metrics = tr_d.train(st_d, iter(all_batches), total)
    assert metrics["train_steps"] == total
    jax.tree.map(np.testing.assert_array_equal, st_c.params, st_d.params)


def test_in_train_periodic_eval(tmp_path):
    """eval_strategy='steps' runs eval_fn every eval_steps micro steps
    and logs eval_loss to the jsonl trail (HF Trainer parity — the
    reference configs expose eval_steps)."""
    import json

    import jax
    import jax.numpy as jnp

    from llamole_tpu.train.trainer import Trainer

    def loss_fn(p, frozen, rng, batch):
        pred = batch["x"] @ p["w"]
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, {"lm_loss": loss, "design_loss": 0.0,
                      "retro_loss": 0.0}

    rng = np.random.RandomState(0)
    batches = [{"x": rng.randn(4, 3).astype(np.float32),
                "y": rng.randn(4, 2).astype(np.float32),
                "attention_mask": np.ones((4, 3), np.int32)}
               for _ in range(6)]
    args = TrainingArguments(learning_rate=1e-2, logging_steps=100,
                             eval_strategy="steps", eval_steps=2,
                             output_dir=str(tmp_path))
    tr = Trainer(loss_fn, frozen={}, args=args, num_training_steps=6)
    st = tr.init_state({"w": jnp.zeros((3, 2))}, seed=0)
    calls = []

    def eval_fn(state):
        calls.append(state.step)
        return 0.25

    st, _ = tr.train(st, iter(batches), 6, eval_fn=eval_fn)
    assert calls == [2, 4, 6]
    log_path = tmp_path / "trainer_log.jsonl"
    rows = [json.loads(line) for line in log_path.read_text().splitlines()]
    evals = [r for r in rows if "eval_loss" in r]
    assert len(evals) == 3 and evals[0]["eval_loss"] == 0.25

    # strategy "no" (default) never calls eval_fn even when provided
    args2 = TrainingArguments(learning_rate=1e-2, logging_steps=100,
                              eval_steps=2)
    tr2 = Trainer(loss_fn, frozen={}, args=args2, num_training_steps=6)
    st2 = tr2.init_state({"w": jnp.zeros((3, 2))}, seed=0)
    calls2 = []
    tr2.train(st2, iter(batches), 6,
              eval_fn=lambda s: calls2.append(s.step) or 0.0)
    assert calls2 == []


def test_orbax_async_checkpoint_roundtrip(tmp_path, monkeypatch):
    """LLAMOLE_ORBAX=1: async orbax save commits (wait barrier) and
    restores bit-exact params + opt state."""
    import jax
    import jax.numpy as jnp

    from llamole_tpu.train.trainer import Trainer, TrainState

    monkeypatch.setenv("LLAMOLE_ORBAX", "1")
    args = TrainingArguments(learning_rate=1e-3,
                             lr_scheduler_type="constant",
                             output_dir=str(tmp_path))

    def loss_fn(t, f, r, b):
        return jnp.sum(t["w"] ** 2), {"lm_loss": 0.0, "design_loss": 0.0,
                                      "retro_loss": 0.0}

    trainer = Trainer(loss_fn, frozen={}, args=args, num_training_steps=4)
    params = {"w": jnp.arange(12.0).reshape(3, 4)}
    state = trainer.init_state(params, seed=0)
    state.step = 7
    ckpt = str(tmp_path / "checkpoint-7")
    trainer.save_checkpoint(state, ckpt)
    trainer.wait_for_checkpoints()
    meta = json.load(open(os.path.join(ckpt, "trainer_state.json")))
    assert meta["backend"] == "orbax" and meta["step"] == 7

    fresh = trainer.init_state({"w": jnp.zeros((3, 4))}, seed=0)
    restored = trainer.load_checkpoint(fresh, ckpt)
    assert restored.step == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(12.0).reshape(3, 4))


def test_prefetch_worker_dies_with_consumer():
    """Abandoning the prefetch generator mid-stream must terminate the
    worker thread (it used to park on queue.put forever — one leaked
    thread per training run)."""
    import threading
    import time

    from llamole_tpu.train.trainer import _prefetch

    before = threading.active_count()
    gen = _prefetch(iter(range(100)), depth=2)
    assert next(gen) == 0
    gen.close()  # consumer walks away
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"


def test_prefetch_propagates_errors_and_completes():
    from llamole_tpu.train.trainer import _prefetch

    assert list(_prefetch(iter([1, 2, 3]))) == [1, 2, 3]

    def bad():
        yield 1
        raise RuntimeError("collation exploded")

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="collation exploded"):
        list(_prefetch(bad()))
