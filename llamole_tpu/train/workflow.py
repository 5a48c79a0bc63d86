"""run_mmsft: multimodal supervised fine-tuning end to end
(parity: src/train/mmsft/workflow.py:41-122 + tuner.py:35 run_train).
"""

import json
import math
import os
import random
from typing import Any, Dict, Iterator, List

import numpy as np

from ..config import get_train_args
from ..data.collator import SeqGraphCollator
from ..data.loader import get_dataset
from ..models.loader import build_graph_lm
from ..utils.logging import get_logger
from .trainer import Trainer, find_last_checkpoint

logger = get_logger(__name__)


def _pad_batch_rows(batch: Dict[str, np.ndarray], rows: int,
                    pad_id: int) -> Dict[str, np.ndarray]:
    """Append inert rows (no loss contribution) so dp sharding divides."""
    from ..utils.constants import IGNORE_INDEX, NO_LABEL_INDEX
    b = batch["input_ids"].shape[0]
    if rows <= 0:
        return batch
    out = dict(batch)
    out["input_ids"] = np.concatenate(
        [batch["input_ids"],
         np.full((rows, batch["input_ids"].shape[1]), pad_id, np.int32)])
    out["attention_mask"] = np.concatenate(
        [batch["attention_mask"],
         np.zeros((rows, batch["attention_mask"].shape[1]), np.int32)])
    out["labels"] = np.concatenate(
        [batch["labels"],
         np.full((rows, batch["labels"].shape[1]), IGNORE_INDEX, np.int32)])
    out["molecule_properties"] = np.concatenate(
        [batch["molecule_properties"],
         np.full((rows, 10), float(NO_LABEL_INDEX), np.float32)])
    for key in ("design_graph_index", "design_start_pos"):
        out[key] = np.concatenate([batch[key], np.full(rows, -1, np.int32)])
    return out


def _epoch_batches(inputs: List[Dict], collator, batch_size: int,
                   epochs: float, seed: int,
                   dp: int = 1, pad_id: int = 0,
                   skip: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Seeded per-epoch shuffle; `skip` fast-forwards past the first
    `skip` batches WITHOUT collating them (resume: the shuffle is
    deterministic, so skipping reproduces the uninterrupted data order
    — HF Trainer's skip_first_batches analog)."""
    n_epochs = int(math.ceil(epochs))
    frac_last = epochs - int(epochs)
    rng = random.Random(seed)
    for e in range(n_epochs):
        order = list(range(len(inputs)))
        rng.shuffle(order)   # always advance the rng, even when skipping
        if e == n_epochs - 1 and frac_last > 0:
            order = order[: max(1, int(len(order) * frac_last))]
        n_batches = math.ceil(len(order) / batch_size)
        if skip >= n_batches:
            skip -= n_batches
            continue
        start = skip * batch_size
        skip = 0
        for i in range(start, len(order), batch_size):
            chunk = [inputs[j] for j in order[i:i + batch_size]]
            batch = collator(chunk)
            if dp > 1:
                short = (-batch["input_ids"].shape[0]) % dp
                batch = _pad_batch_rows(batch, short, pad_id)
            yield batch


def run_mmsft(args: Any = None) -> Dict[str, float]:
    model_args, data_args, training_args, finetuning_args, generating_args = (
        get_train_args(args))

    model, frozen, trainable, tokenizer = build_graph_lm(
        model_args, data_args, finetuning_args, seed=training_args.seed)
    bank, inputs = get_dataset(model_args, data_args, training_args, tokenizer)

    # validation split (val_size parity: config/train yaml)
    val_inputs: List[Dict] = []
    if data_args.val_size and data_args.val_size > 0 and len(inputs) > 1:
        k = max(1, int(len(inputs) * data_args.val_size))
        val_inputs, inputs = inputs[:k], inputs[k:]

    max_nodes = model.graph_decoder.cfg.max_n_nodes
    bsz = training_args.per_device_train_batch_size
    collator = SeqGraphCollator(
        tokenizer=tokenizer, mol_id_to_graph=bank,
        max_len=data_args.cutoff_len, max_nodes=max_nodes,
        max_graphs=max(8, bsz * 8), max_retro=max(8, bsz * 8))

    steps_per_epoch = math.ceil(len(inputs) / bsz)
    if training_args.max_steps > 0:
        total_micro = training_args.max_steps
    else:
        total_micro = int(steps_per_epoch * training_args.num_train_epochs)
    opt_steps = max(1, total_micro // max(training_args.gradient_accumulation_steps, 1))

    mesh = None
    dp = 1
    if training_args.mesh:
        from ..parallel import mesh_from_string
        mesh = mesh_from_string(training_args.mesh)
        dp = mesh.shape.get("dp", 1)
        logger.info("training mesh: %s", dict(mesh.shape))
        if mesh.shape.get("pp", 1) > 1:
            # must happen before the first loss_fn trace (jitted with
            # static self); requires scan_layers stacked LLM storage
            model.enable_pipeline(
                mesh, max(training_args.pipeline_microbatches, 1))
            logger.info("pipeline parallelism on: pp=%d, microbatches=%d",
                        mesh.shape["pp"],
                        max(training_args.pipeline_microbatches, 1))

    trainer = Trainer(model.loss_fn, frozen, training_args, opt_steps,
                      mesh=mesh, finetuning_args=finetuning_args)
    state = trainer.init_state(trainable, training_args.seed)

    resume = training_args.resume_from_checkpoint
    if resume is None and training_args.output_dir and not training_args.overwrite_output_dir:
        resume = find_last_checkpoint(training_args.output_dir)
    if resume:
        logger.info("Resuming from %s", resume)
        state = trainer.load_checkpoint(state, resume)

    def save_fn(st, path):
        trainer.save_checkpoint(st, path)
        model.save_pretrained(st.params, path)

    # resume: skip the batches the checkpointed run already consumed —
    # the seeded shuffle makes the remaining stream identical to an
    # uninterrupted run (reference: HF Trainer skip_first_batches via
    # mmsft/trainer.py:161 train(resume_from_checkpoint=...))
    batches = _epoch_batches(inputs, collator, bsz,
                             training_args.num_train_epochs,
                             training_args.seed,
                             dp=dp, pad_id=tokenizer.pad_token_id,
                             skip=state.step)

    # in-train periodic eval (eval_strategy="steps" parity)
    eval_fn = None
    if (val_inputs and training_args.eval_strategy == "steps"
            and training_args.eval_steps):
        import jax
        val_batches = [
            {k: np.asarray(v) for k, v in b.items()}
            for b in _epoch_batches(val_inputs, collator, bsz, 1.0, 0)]

        def eval_fn(st):
            losses = [float(model.loss_fn(st.params, frozen,
                                          jax.random.PRNGKey(0), b,
                                          train=False)[0])
                      for b in val_batches]
            return float(np.mean(losses))

    state, metrics = trainer.train(state, batches, total_micro,
                                   save_fn=save_fn, eval_fn=eval_fn)

    if training_args.output_dir:
        os.makedirs(training_args.output_dir, exist_ok=True)
        model.save_pretrained(state.params, training_args.output_dir)
        trainer.save_checkpoint(
            state, os.path.join(training_args.output_dir,
                                f"checkpoint-{state.step}"))
        with open(os.path.join(training_args.output_dir,
                               "train_results.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        if training_args.plot_loss:
            plot_loss(training_args.output_dir)

    # eval pass: mean loss on the held-out split
    if val_inputs:
        import jax
        losses = []
        for batch in _epoch_batches(val_inputs, collator, bsz, 1.0, 0):
            batch_j = {k: np.asarray(v) for k, v in batch.items()}
            loss, _ = model.loss_fn(state.params, frozen,
                                    jax.random.PRNGKey(0),
                                    {k: v for k, v in batch_j.items()},
                                    train=False)
            losses.append(float(loss))
        metrics["eval_loss"] = float(np.mean(losses))
        logger.info("eval_loss: %.4f", metrics["eval_loss"])
        if training_args.output_dir:
            text_metrics = predict_with_generate(
                model, frozen, state.params, val_inputs, tokenizer,
                generating_args, training_args.output_dir,
                seed=training_args.seed)
            metrics.update(text_metrics)

    logger.info("train metrics: %s", metrics)
    return metrics


def predict_with_generate(model, frozen, trainable, val_inputs, tokenizer,
                          generating_args, output_dir: str,
                          seed: int = 0, max_examples: int = 16):
    """Generate continuations for held-out prompts and dump
    generated_predictions.jsonl with BLEU/ROUGE scores
    (parity: mmsft/trainer.py:87-159 prediction step + jsonl dump,
    metric.py:58-96 ComputeMetrics)."""
    import jax

    from ..models.composite import GenerationSettings
    from ..utils.constants import IGNORE_INDEX
    from .metric import compute_text_metrics

    gen = GenerationSettings(
        max_new_tokens=min(generating_args.max_new_tokens, 64),
        temperature=generating_args.temperature,
        top_p=generating_args.top_p, do_sample=False)
    preds, refs, prompts = [], [], []
    rng = jax.random.PRNGKey(seed)
    for ex in val_inputs[:max_examples]:
        ids = list(ex["input_ids"])
        labels = list(ex["labels"])
        # prompt = prefix where labels are masked
        try:
            first_target = next(i for i, l in enumerate(labels)
                                if l != IGNORE_INDEX)
        except StopIteration:
            continue
        prompt = ids[:first_target]
        if not prompt:
            continue
        reference = tokenizer.decode(
            [l for l in labels if l != IGNORE_INDEX], skip_special_tokens=True)
        p_ids, p_mask = model._left_pad([prompt])
        rng, sub = jax.random.split(rng)
        toks, _ = model._generate_tokens(frozen, trainable, p_ids, p_mask,
                                         sub, gen, model._eos_ids())
        pred = tokenizer.decode(model._strip_pads(toks[0]),
                                skip_special_tokens=True)
        preds.append(pred)
        refs.append(reference)
        prompts.append(tokenizer.decode(prompt, skip_special_tokens=True))
    if not preds:
        return {}
    scores = compute_text_metrics(preds, refs)
    path = os.path.join(output_dir, "generated_predictions.jsonl")
    with open(path, "w") as f:
        for t, p, r in zip(prompts, preds, refs):
            # schema parity: mmsft/trainer.py:155-157
            f.write(json.dumps({"prompt": t, "label": r, "predict": p}) + "\n")
    logger.info("prediction metrics: %s", scores)
    return {f"predict_{k}": v for k, v in scores.items()}


def plot_loss(output_dir: str) -> None:
    """EMA loss curve PNG from trainer_log.jsonl
    (parity: extras/ploting.py:73-101)."""
    log_file = os.path.join(output_dir, "trainer_log.jsonl")
    if not os.path.exists(log_file):
        return
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        logger.warning("matplotlib unavailable; skipping loss plot")
        return
    steps, losses = [], []
    with open(log_file) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                steps.append(rec["current_steps"])
                losses.append(rec["loss"])
    if not losses:
        return
    ema, out = 0.0, []
    for i, l in enumerate(losses):
        ema = l if i == 0 else 0.9 * ema + 0.1 * l
        out.append(ema)
    plt.figure()
    plt.plot(steps, losses, alpha=0.4, label="loss")
    plt.plot(steps, out, label="smoothed")
    plt.xlabel("step")
    plt.ylabel("loss")
    plt.legend()
    plt.savefig(os.path.join(output_dir, "training_loss.png"), dpi=100)
    plt.close()
