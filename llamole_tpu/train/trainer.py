"""The mmsft training loop: optax AdamW + cosine schedule, gradient
accumulation, grad clipping, checkpointing, jsonl metrics.

Counterpart of the reference CustomSeq2SeqTrainer + HF Trainer innards
(src/train/mmsft/trainer.py:58-255, callbacks.py:172-349): same
optimizer family and schedule surface (TrainingArguments keys), token
accuracy metric (mmsft/metric.py:42-50), trainer_log.jsonl records with
loss/lr/epoch/throughput, checkpoint-N directories with auto-resume
discovery (hparams/parser.py:267-283 analog).
"""

import glob
import json
import math
import os
import re
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainingArguments
from ..utils.constants import IGNORE_INDEX
from ..utils.logging import JsonlLogger, get_logger
from ..utils.serialization import load_pytree, load_state, save_pytree, save_state

logger = get_logger(__name__)


def create_optimizer(args: TrainingArguments, num_training_steps: int,
                     finetuning_args=None):
    warmup = args.warmup_steps or int(args.warmup_ratio * num_training_steps)
    if args.lr_scheduler_type == "cosine":
        warmup_steps = max(warmup, 1)
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, args.learning_rate, warmup_steps,
            max(num_training_steps, warmup_steps + 1))
    elif args.lr_scheduler_type == "linear":
        schedule = optax.join_schedules([
            optax.linear_schedule(0.0, args.learning_rate, max(warmup, 1)),
            optax.linear_schedule(args.learning_rate, 0.0,
                                  max(num_training_steps - warmup, 1)),
        ], [max(warmup, 1)])
    else:  # constant
        schedule = optax.constant_schedule(args.learning_rate)
    from .optimizers import build_custom_optimizer, wants_custom_optimizer
    if wants_custom_optimizer(finetuning_args):
        base = build_custom_optimizer(args, schedule, finetuning_args)
    else:
        base = optax.adamw(schedule, b1=args.adam_beta1, b2=args.adam_beta2,
                           eps=args.adam_epsilon,
                           weight_decay=args.weight_decay)
    tx = optax.chain(optax.clip_by_global_norm(args.max_grad_norm), base)
    if args.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)
    return tx, schedule


@dataclass
class TrainState:
    step: int
    params: Any           # trainable bundle
    opt_state: Any
    rng: jax.Array


def token_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Accuracy over unmasked label positions (metric.py:42-50)."""
    pred = jnp.argmax(logits[:, :-1], axis=-1)
    tgt = labels[:, 1:]
    mask = tgt != IGNORE_INDEX
    correct = jnp.where(mask, pred == tgt, False)
    return correct.sum() / jnp.clip(mask.sum(), 1, None)


class Trainer:
    def __init__(
        self,
        loss_fn: Callable,   # (trainable, frozen, rng, batch) -> (loss, aux)
        frozen: Any,
        args: TrainingArguments,
        num_training_steps: int,
        mesh=None,           # optional Mesh with a 'dp' axis: data parallel
        finetuning_args=None,  # enables GaLore/LoRA+/BAdam wrapping
    ):
        self.loss_fn = loss_fn
        self.frozen = frozen
        self.args = args
        self.mesh = mesh
        self.num_training_steps = num_training_steps
        self.tx, self.schedule = create_optimizer(args, num_training_steps,
                                                  finetuning_args)
        self.jsonl = (JsonlLogger(os.path.join(args.output_dir, "trainer_log.jsonl"))
                      if args.output_dir else None)
        # ZeRO-1 analog: shard optimizer moments (and MultiSteps grad
        # buffers) along dp; params re-replicated after each update
        self._zero1 = bool(
            mesh is not None
            and getattr(args, "zero_stage", 0) >= 1
            and mesh.shape.get("dp", 1) > 1)
        # ZeRO-3/FSDP analog: FROZEN LLM parameter storage shards along
        # dp too (fsdp_param_pspecs); GSPMD all-gathers per layer at use
        # — the big win for LoRA/frozen-base training where the 8B base
        # dominates HBM (reference ds_z3 configs, parser.py:188-196)
        self._zero3 = bool(
            mesh is not None
            and getattr(args, "zero_stage", 0) >= 3
            and mesh.shape.get("dp", 1) > 1)
        self._opt_shardings = None   # set in init_state when zero1
        # expert-parallel axis for MoE params (llm_param_pspecs ep_axis);
        # without this the 'ep' mesh axis would be silently inert and
        # expert weights replicated on every device
        self._ep_axis = ("ep" if (mesh is not None
                                  and mesh.shape.get("ep", 1) > 1)
                         else None)
        self._jit_step = jax.jit(self._step)
        if mesh is not None:
            from ..parallel.sharding import (llm_param_pspecs, replicate,
                                             shard_params)
            fz = dict(self.frozen) if isinstance(self.frozen, dict) else self.frozen
            pp = mesh.shape.get("pp", 1) if hasattr(mesh, "shape") else 1
            if pp > 1 and self._zero3:
                raise ValueError(
                    "zero_stage=3 with pipeline parallelism is not "
                    "supported: pp already shards the layer stack; use "
                    "zero_stage<=1 with pp, or dp-only fsdp")
            if (isinstance(fz, dict) and "llm" in fz and pp > 1):
                # pipeline parallelism: layer-stack depth shards over pp
                # (the model must have enable_pipeline() set so loss_fn
                # routes through parallel/pipeline.py)
                from ..parallel.pipeline import pipeline_param_pspecs
                fz["llm"] = shard_params(fz["llm"], mesh,
                                         pipeline_param_pspecs(fz["llm"]))
                for k in fz:
                    if k != "llm":
                        fz[k] = replicate(fz[k], mesh)
                self.frozen = fz
            elif (isinstance(fz, dict) and "llm" in fz
                    and (mesh.shape.get("tp", 1) > 1
                         or self._ep_axis is not None
                         or self._zero3)):
                if self._zero3:
                    from ..parallel.sharding import fsdp_param_pspecs
                    pspecs = fsdp_param_pspecs(
                        fz["llm"], dp=mesh.shape["dp"],
                        tp_axis=("tp" if mesh.shape.get("tp", 1) > 1
                                 else None),
                        ep_axis=self._ep_axis)
                else:
                    pspecs = llm_param_pspecs(fz["llm"],
                                              ep_axis=self._ep_axis)
                fz["llm"] = shard_params(fz["llm"], mesh, pspecs)
                for k in fz:
                    if k != "llm":
                        fz[k] = replicate(fz[k], mesh)
                self.frozen = fz
            else:
                self.frozen = replicate(self.frozen, mesh)
        else:
            # no mesh: commit once — a numpy frozen tree (msgpack loads)
            # would otherwise re-upload host->device every step
            self.frozen = jax.device_put(self.frozen)

    # per-sequence arrays shard over dp; graph banks replicate (their row
    # indices span the whole batch)
    _PER_SEQ = ("input_ids", "attention_mask", "labels",
                "molecule_properties", "design_graph_index",
                "design_start_pos")

    def _place_batch(self, batch):
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = self.mesh.shape.get("dp", 1)
        dcn = self.mesh.shape.get("dcn", 1)
        # multi-slice: batch shards over the outer dcn axis too, so each
        # slice works an independent sub-batch and only the gradient
        # all-reduce crosses the data-center network
        axes = ("dcn", "dp") if dcn > 1 else "dp"
        out = {}
        for k, v in batch.items():
            arr = jnp.asarray(v)
            if k in self._PER_SEQ and arr.shape[0] % (dp * dcn) == 0:
                spec = P(axes)
            else:
                spec = P()
            out[k] = jax.device_put(arr, NamedSharding(self.mesh, spec))
        return out

    def _step(self, params, opt_state, rng, batch, frozen):
        # frozen params are a traced ARGUMENT, not a closure: closing over
        # them would bake the whole frozen tree into the lowered program
        # as constants — at 8B that's 8.56 GB of captured constants and a
        # compile that never finishes (measured; NOTES_ROUND3.md)
        rng, sub = jax.random.split(rng)

        def lf(p):
            loss, aux = self.loss_fn(p, frozen, sub, batch)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        if self._opt_shardings is not None:
            # keep moments dp-sharded through the update (GSPMD then
            # lowers grads->moments as reduce-scatter + local adam)
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, self._opt_shardings)
        params = optax.apply_updates(params, updates)
        if self._opt_shardings is not None:
            # ZeRO-1: updated params are all-gathered back to their own
            # layout (replicated, or tp-sharded for a full-finetune LLM)
            params = jax.lax.with_sharding_constraint(
                params, self._param_shardings)
        gnorm = optax.global_norm(grads)
        return params, opt_state, rng, loss, aux, gnorm

    def init_state(self, trainable, seed: int) -> TrainState:
        if self.mesh is not None:
            from ..parallel.sharding import (llm_param_pspecs, replicate,
                                             shard_params)
            if (isinstance(trainable, dict)
                    and self.mesh.shape.get("pp", 1) > 1):
                # stacked leaves (full-finetune LLM or stacked LoRA)
                # shard depth over pp; everything else replicates
                from ..parallel.pipeline import pipeline_param_pspecs
                trainable = shard_params(
                    trainable, self.mesh,
                    pipeline_param_pspecs(trainable, strict=False))
            elif (isinstance(trainable, dict) and "llm" in trainable
                    and (self.mesh.shape.get("tp", 1) > 1
                         or self._ep_axis is not None)):
                # full finetuning: the LLM itself is trainable and must
                # live tensor/expert-parallel, like the frozen-path LLM
                trainable = dict(trainable)
                trainable["llm"] = shard_params(
                    trainable["llm"], self.mesh,
                    llm_param_pspecs(trainable["llm"],
                                     ep_axis=self._ep_axis))
                for k in trainable:
                    if k != "llm":
                        trainable[k] = replicate(trainable[k], self.mesh)
            else:
                trainable = replicate(trainable, self.mesh)
        opt_state = self.tx.init(trainable)
        if self._zero1:
            from jax.sharding import NamedSharding
            from ..parallel.sharding import shard_params, zero1_opt_pspecs
            pspecs = zero1_opt_pspecs(opt_state, self.mesh.shape["dp"])
            opt_state = shard_params(opt_state, self.mesh, pspecs)
            self._opt_shardings = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s), pspecs)
            self._param_shardings = jax.tree.map(
                lambda x: x.sharding, trainable)
        return TrainState(
            step=0, params=trainable,
            opt_state=opt_state,
            rng=jax.random.PRNGKey(seed))

    def train(
        self,
        state: TrainState,
        batches: Iterator[Dict[str, np.ndarray]],
        total_micro_steps: int,
        save_fn: Optional[Callable[[TrainState, str], None]] = None,
        log_every: Optional[int] = None,
        eval_fn: Optional[Callable[[TrainState], float]] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        args = self.args
        log_every = log_every or args.logging_steps
        t0 = time.time()
        losses: List[float] = []
        window: List[float] = []
        tokens_seen = 0
        # resume semantics (mmsft/trainer.py:161-255 / HF Trainer): a
        # restored state.step counts toward the budget — the run finishes
        # the REMAINING micro steps, it does not start a fresh budget.
        # The caller feeds `batches` already advanced past consumed data
        # (run_mmsft passes skip=state.step to _epoch_batches).
        if state.step >= total_micro_steps:
            logger.info("checkpoint step %d >= total steps %d: nothing to do",
                        state.step, total_micro_steps)
            return state, {"train_loss": float("nan"),
                           "train_steps": state.step, "train_runtime": 0.0}
        for batch in _prefetch(batches, depth=2):
            if state.step >= total_micro_steps:
                break
            batch_j = self._place_batch(batch)
            tokens_seen += int(np.asarray(batch["attention_mask"]).sum())
            (state.params, state.opt_state, state.rng,
             loss, aux, gnorm) = self._jit_step(
                state.params, state.opt_state, state.rng, batch_j,
                self.frozen)
            state.step += 1
            # loss stays a DEVICE scalar here: float(loss) would force a
            # host sync every step — over the axon tunnel that round trip
            # stalls dispatch and dominates small-model steps (measured,
            # r5 mmsft). The window drains once per log_every.
            window.append(loss)
            opt_step = state.step // max(args.gradient_accumulation_steps, 1)
            if state.step % log_every == 0:
                vals = np.asarray(jnp.stack(window)).tolist()
                window.clear()
                for i, v in enumerate(vals):
                    if not math.isfinite(v):
                        logger.warning("non-finite loss at step %d",
                                       state.step - len(vals) + 1 + i)
                losses.extend(vals)
                lr = float(self.schedule(opt_step))
                elapsed = time.time() - t0
                rec = {
                    "current_steps": state.step,
                    "total_steps": total_micro_steps,
                    "loss": sum(vals) / len(vals),
                    "lm_loss": float(aux["lm_loss"]),
                    "design_loss": float(aux["design_loss"]),
                    "retro_loss": float(aux["retro_loss"]),
                    "grad_norm": float(gnorm),
                    "learning_rate": lr,
                    "epoch": state.step / max(total_micro_steps, 1)
                             * float(args.num_train_epochs),
                    "throughput_tok_s": tokens_seen / max(elapsed, 1e-9),
                    "elapsed": elapsed,
                }
                logger.info(
                    "step %d/%d loss %.4f lr %.2e %.0f tok/s",
                    state.step, total_micro_steps, rec["loss"], lr,
                    rec["throughput_tok_s"])
                if self.jsonl:
                    self.jsonl.log(rec)
            if (args.output_dir and save_fn and args.save_steps
                    and state.step % args.save_steps == 0):
                ckpt = os.path.join(args.output_dir, f"checkpoint-{state.step}")
                save_fn(state, ckpt)
            # periodic held-out eval (HF Trainer eval_strategy="steps"
            # parity; the reference configs expose eval_steps)
            if (eval_fn is not None and args.eval_strategy == "steps"
                    and args.eval_steps
                    and state.step % args.eval_steps == 0):
                ev = float(eval_fn(state))
                logger.info("step %d eval_loss %.4f", state.step, ev)
                if self.jsonl:
                    self.jsonl.log({"current_steps": state.step,
                                    "total_steps": total_micro_steps,
                                    "eval_loss": ev})
        if window:  # drain device scalars left since the last log boundary
            losses.extend(np.asarray(jnp.stack(window)).tolist())
            window.clear()
        self.wait_for_checkpoints()  # async orbax saves commit before exit
        metrics = {
            "train_loss": float(np.mean(losses)) if losses else float("nan"),
            "train_steps": state.step,
            "train_runtime": time.time() - t0,
        }
        return state, metrics

    # -- checkpointing ------------------------------------------------------
    # msgpack is the default; orbax (sharded, production multi-chip) kicks
    # in when LLAMOLE_ORBAX=1. Orbax saves are ASYNC: the device step
    # continues while the previous checkpoint writes (reference analog:
    # HF Trainer blocks; this is the TPU-native improvement), with
    # wait_for_checkpoints() as the barrier before exit/reload.
    def _use_orbax(self) -> bool:
        return bool(os.environ.get("LLAMOLE_ORBAX"))

    def _orbax_ckptr(self):
        if not hasattr(self, "_async_ckptr"):
            import orbax.checkpoint as ocp
            self._async_ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        return self._async_ckptr

    def wait_for_checkpoints(self) -> None:
        """Block until every in-flight async orbax save has committed."""
        if getattr(self, "_async_ckptr", None) is not None:
            self._async_ckptr.wait_until_finished()

    def save_checkpoint(self, state: TrainState, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        if self._use_orbax():
            ckptr = self._orbax_ckptr()
            ckptr.wait_until_finished()  # previous checkpoint committed
            ckptr.save(os.path.join(os.path.abspath(path), "orbax_state"),
                       {"params": state.params,
                        "opt_state": state.opt_state}, force=True)
        else:
            save_pytree(state.params, os.path.join(path, "trainable.msgpack"))
            save_state(state.opt_state, os.path.join(path, "opt_state.msgpack"))
        meta = {"step": state.step,
                "rng": np.asarray(jax.random.key_data(state.rng)).tolist(),
                "backend": "orbax" if self._use_orbax() else "msgpack"}
        with open(os.path.join(path, "trainer_state.json"), "w") as f:
            json.dump(meta, f)

    def load_checkpoint(self, state: TrainState, path: str) -> TrainState:
        with open(os.path.join(path, "trainer_state.json")) as f:
            meta = json.load(f)
        if meta.get("backend") == "orbax":
            import orbax.checkpoint as ocp
            self.wait_for_checkpoints()
            with ocp.StandardCheckpointer() as ckptr:
                restored = ckptr.restore(
                    os.path.join(os.path.abspath(path), "orbax_state"),
                    {"params": state.params, "opt_state": state.opt_state})
            params = restored["params"]
            opt_state = restored["opt_state"]
        else:
            params = load_pytree(os.path.join(path, "trainable.msgpack"))
            opt_state = load_state(state.opt_state,
                                   os.path.join(path, "opt_state.msgpack"))
        rng = jax.random.wrap_key_data(
            jnp.asarray(meta["rng"], dtype=jnp.uint32))
        if self._opt_shardings is not None:
            opt_state = jax.tree.map(jax.device_put, opt_state,
                                     self._opt_shardings)
        if self.mesh is not None:
            # restore the SAME placement init_state chose: a tp-sharded
            # full-finetune LLM must not come back replicated (at 8B a
            # replicated restore would OOM every device — review finding)
            from ..parallel.sharding import (llm_param_pspecs, replicate,
                                             shard_params)
            if (isinstance(params, dict) and "llm" in params
                    and (self.mesh.shape.get("tp", 1) > 1
                         or self._ep_axis is not None)):
                params = dict(params)
                params["llm"] = shard_params(
                    params["llm"], self.mesh,
                    llm_param_pspecs(params["llm"], ep_axis=self._ep_axis))
                for k in params:
                    if k != "llm":
                        params[k] = replicate(params[k], self.mesh)
            else:
                params = replicate(params, self.mesh)
        return TrainState(step=meta["step"], params=params,
                          opt_state=opt_state, rng=rng)


def _prefetch(iterator, depth: int = 2):
    """Host-side batch prefetch: collation overlaps the device step
    (SURVEY §7.9 double-buffered host featurization).

    The worker must DIE when the consumer stops early (step budget,
    exception): a plain q.put blocks forever once nobody drains the
    queue, leaking one thread per training run (observed parked in
    full-suite crash dumps)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    err: List[BaseException] = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(item):
                    return
        except BaseException as e:  # propagate collation errors
            err.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        t.join(timeout=2.0)


def _checkpoint_complete(d: str) -> bool:
    """A crash during an ASYNC orbax save can leave trainer_state.json
    without a committed orbax_state dir (orbax renames atomically on
    commit); such dirs must not win auto-resume."""
    meta_file = os.path.join(d, "trainer_state.json")
    if not os.path.exists(meta_file):
        return False
    try:
        with open(meta_file) as f:
            backend = json.load(f).get("backend", "msgpack")
    except (OSError, json.JSONDecodeError):
        return False
    if backend == "orbax":
        return os.path.isdir(os.path.join(d, "orbax_state"))
    return os.path.exists(os.path.join(d, "trainable.msgpack"))


def find_last_checkpoint(output_dir: str) -> Optional[str]:
    """checkpoint-N auto-discovery (parser.py:267-283 analog); skips
    checkpoints whose payload never committed."""
    if not output_dir or not os.path.isdir(output_dir):
        return None
    best, best_n = None, -1
    for d in glob.glob(os.path.join(output_dir, "checkpoint-*")):
        m = re.match(r".*checkpoint-(\d+)$", d)
        if m and os.path.isdir(d) and _checkpoint_complete(d):
            n = int(m.group(1))
            if n > best_n:
                best, best_n = d, n
    return best
