"""Headless batch-serving surface for molecular design.

The reference's only serving interface is the one-request-at-a-time
Gradio app (launch.py:116-238). TPU serving lives or dies on static
shapes and batching, so this module adds the production pattern the
reference lacks: a request queue + a scheduler thread that assembles
FIXED-SHAPE batches (prompt length bucketed to 64-multiples, batch
padded to the compiled size by repeating the last row) and runs the
Phase-1 design pipeline once per batch — one compiled program per
(length-bucket), amortized across requests.

Two entry points:
  * DesignServer — programmatic: submit() returns a Future-like handle.
  * serve_jsonl  — CLI (`python main.py serve <config.yaml>`): JSONL
    requests on stdin -> JSONL results on stdout; works offline and
    composes with any process-level transport.

Request schema (JSONL line / submit kwargs):
  {"prompt": str, "property": {name: value, ...}, "retro": bool}
  Property names from MOL_PROPERTIES; absent channels ride as NaN
  (unconditioned), the eval-dataset convention (reference
  eval/dataset.py:36-47). "retro": true additionally plans a synthesis
  route for the designed molecule — routes for all retro-requesting
  rows of a batch run as ONE cross-target interleaved search
  (composite.retrosynthesize_batch).
Result schema:
  {"id": n, "text": str, "smiles": str | null,
   "retro": {"success": bool, "reactions": [...], "templates": [...],
             "cost": [...]} }          # only when requested
"""

import json
import queue
import sys
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from .models.composite import GenerationSettings
from .utils.constants import MOL_PROPERTIES
from .utils.logging import get_logger

logger = get_logger(__name__)


@dataclass
class _Pending:
    prompt_ids: List[int]
    properties: np.ndarray
    retro: bool = False
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, Any]] = None
    t_submit: float = field(default_factory=time.monotonic)

    def resolve(self, result: Dict[str, Any]) -> float:
        """Set the result (stamped with request latency) and wake the
        waiter; returns the latency for server-side stats."""
        latency = time.monotonic() - self.t_submit
        result["latency_s"] = round(latency, 4)
        self.result = result
        self.event.set()
        return latency


class _LatencyStats:
    """Rolling latency window shared by both server flavors."""

    def __init__(self, window: int = 512):
        self._window = window
        self._lat: List[float] = []
        self._lock = threading.Lock()

    def record(self, latency: float) -> None:
        with self._lock:
            self._lat.append(latency)
            if len(self._lat) > self._window:
                del self._lat[:-self._window]

    def summary(self) -> Dict[str, float]:
        with self._lock:
            lat = sorted(self._lat)
        if not lat:
            return {}
        pick = lambda q: lat[min(int(q * len(lat)), len(lat) - 1)]
        return {"latency_p50_s": round(pick(0.50), 4),
                "latency_p95_s": round(pick(0.95), 4),
                "latency_max_s": round(lat[-1], 4)}


class DesignHandle:
    """Future-like handle for one submitted request."""

    def __init__(self, pending: _Pending):
        self._p = pending

    def result(self, timeout: Optional[float] = None) -> Dict[str, Any]:
        if not self._p.event.wait(timeout):
            raise TimeoutError("design request not completed in time")
        return self._p.result


def properties_vector(prop: Optional[Dict[str, float]]) -> np.ndarray:
    """10-dim conditioning vector; absent channels NaN (-> the learned
    null embedding under CFG; reference eval/dataset.py:36-47)."""
    vec = np.full(len(MOL_PROPERTIES), np.nan, np.float32)
    for name, value in (prop or {}).items():
        if name in MOL_PROPERTIES:
            vec[MOL_PROPERTIES.index(name)] = float(value)
        else:
            raise ValueError(
                f"unknown property {name!r}; expected one of "
                f"{list(MOL_PROPERTIES)}")
    return vec


def _retro_payload(plan: Dict[str, Any]) -> Dict[str, Any]:
    """Result-schema retro block from a planner output (or {} when the
    search failed / was skipped)."""
    return {"success": bool(plan.get("success")),
            "reactions": list(plan.get("reaction_list") or []),
            "templates": list(plan.get("templates") or []),
            "cost": [float(c) for c in (plan.get("cost") or [])]}


class _DesignServerBase:
    """Request-side plumbing shared by both server flavors: submission
    with stop-race handling, latency stats, and error resolution.
    Subclasses provide tokenizer/_queue/_stop/_lat and the scheduler."""

    def submit(self, prompt: str,
               properties: Optional[Dict[str, float]] = None,
               retro: bool = False) -> DesignHandle:
        pending = _Pending(
            prompt_ids=self.tokenizer.encode(prompt),
            properties=properties_vector(properties),
            retro=bool(retro))
        if self._stop.is_set():
            # stopped (or stopping) server: resolve immediately rather
            # than enqueue into a drain nobody will run again
            pending.resolve({"text": "", "smiles": None,
                             "error": "server stopped"})
            return DesignHandle(pending)
        self._queue.put(pending)
        if self._stop.is_set() and not pending.event.is_set():
            # raced stop()'s drain: the scheduler is gone, so resolve
            # whatever the drain missed
            self._drain_queue(self._queue)
        return DesignHandle(pending)

    def stats(self) -> Dict[str, Any]:
        """Serving counters + rolling latency percentiles."""
        return {"requests_served": self.requests_served,
                "batches_run": self.batches_run,
                **self._extra_stats(), **self._lat.summary()}

    def _extra_stats(self) -> Dict[str, Any]:
        return {}

    def _resolve_error(self, p: _Pending, msg: str) -> None:
        if not p.event.is_set():
            self._lat.record(p.resolve(
                {"text": "", "smiles": None, "error": msg}))

    def _drain_queue(self, q: "queue.Queue",
                     extract=lambda item: (item,)) -> None:
        """Empty a queue, resolving every pending it held as stopped."""
        while True:
            try:
                item = q.get_nowait()
            except queue.Empty:
                return
            for p in extract(item):
                self._resolve_error(p, "server stopped")


class DesignServer(_DesignServerBase):
    """Batching scheduler over GraphLM.design_molecule.

    Requests accumulate until `batch_size` are waiting or the oldest has
    waited `max_wait_s`; each flush pads the batch to exactly
    `batch_size` rows (repeating the last request — static shape, one
    compile) and left-pads prompts to a shared 64-multiple bucket.
    """

    def __init__(self, model, frozen, trainable, tokenizer, *,
                 batch_size: int = 8, max_wait_s: float = 0.05,
                 gen: GenerationSettings = GenerationSettings(),
                 rollback: bool = True, seed: int = 0,
                 retro_topk: int = 50, retro_iterations: int = 100,
                 retro_max_time: float = 30.0, retro_width: int = 8):
        self.model = model
        self.frozen = frozen
        self.trainable = trainable
        self.tokenizer = tokenizer
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_s)
        self.gen = gen
        self.rollback = rollback
        self.retro_topk = retro_topk
        self.retro_iterations = retro_iterations
        self.retro_max_time = retro_max_time
        self.retro_width = retro_width
        self._rng = jax.random.PRNGKey(seed)
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.batches_run = 0
        self.requests_served = 0
        self._lat = _LatencyStats()

    # -- scheduler side ----------------------------------------------------
    def start(self) -> "DesignServer":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=60)
        # anything still queued must not leave its waiter hanging
        self._drain_queue(self._queue)

    def _gather(self) -> List[_Pending]:
        """Block for the first request, then fill the batch until full
        or the max-wait deadline passes."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._gather()
            if not batch:
                continue
            try:
                self._run_batch(batch)
            except Exception as e:  # a bad batch must not kill the server
                logger.exception("design batch failed: %s", e)
                for p in batch:
                    # rows already resolved (design-only results are set
                    # before the retro phase) keep their good results
                    self._resolve_error(p, str(e))

    def _run_batch(self, batch: List[_Pending]) -> None:
        n_real = len(batch)
        rows = batch + [batch[-1]] * (self.batch_size - n_real)
        # the model's own left-pad handles empty prompts; bucket the
        # width to a 64-multiple so the decode program compiles once per
        # length bucket
        ids, mask = self.model._left_pad([p.prompt_ids for p in rows])
        L = ids.shape[1]
        bucket = ((L + 63) // 64) * 64
        pad = self.tokenizer.pad_token_id
        if bucket != L:
            ids = np.concatenate(
                [np.full((self.batch_size, bucket - L), pad, np.int32),
                 ids], axis=1)
            mask = np.concatenate(
                [np.zeros((self.batch_size, bucket - L), np.int32),
                 mask], axis=1)
        props = np.zeros((self.batch_size, len(MOL_PROPERTIES)), np.float32)
        for i, p in enumerate(rows):
            props[i] = p.properties

        self._rng, sub = jax.random.split(self._rng)
        analysis, smiles = self.model.design_molecule(
            self.frozen, self.trainable, sub, ids, mask, props,
            gen=self.gen, rollback=self.rollback)
        analysis = np.asarray(analysis)

        # resolve design-only rows IMMEDIATELY — they must not wait
        # behind the (possibly minutes-long) retro search of co-batched
        # requests
        for i, p in enumerate(batch):
            toks = self.model._strip_pads(analysis[i])
            result = {
                "text": self.tokenizer.decode(toks,
                                              skip_special_tokens=True),
                "smiles": smiles[i],
            }
            if not p.retro or smiles[i] is None:
                if p.retro:  # requested but nothing designed to plan for
                    result["retro"] = _retro_payload({})
                self._lat.record(p.resolve(result))
            else:
                p.result = result   # resolved after the retro phase

        # one interleaved Retro* search spans every retro-requesting row
        retro_rows = [(i, p) for i, p in enumerate(batch)
                      if p.retro and smiles[i] is not None]
        if retro_rows:
            self._rng, sub2 = jax.random.split(self._rng)
            plans = self.model.retrosynthesize_batch(
                self.frozen, self.trainable, sub2,
                [smiles[i] for i, _ in retro_rows],
                expansion_topk=self.retro_topk,
                iterations=self.retro_iterations,
                max_planning_time=self.retro_max_time,
                rollback=False, gen=self.gen,
                total_width=self.retro_width)
            for i, p in retro_rows:
                p.result["retro"] = _retro_payload(plans.get(smiles[i], {}))
                self._lat.record(p.resolve(p.result))
        self.batches_run += 1
        self.requests_served += n_real


class ContinuousDesignServer(_DesignServerBase):
    """In-flight batched design serving (continuous batching).

    Stage 1 (analysis decode) streams through a SlotDecoder pool
    (models/gllm/continuous.py): a request joins the running pool at
    the next chunk boundary and a finished row frees its slot
    immediately — no full-batch head-of-line waiting, which matters
    once real weights make analysis lengths short and highly variable.
    Stage 2 (body re-forward -> connector -> GraphDiT -> assembly)
    batches completed analyses into fixed-size groups
    (composite.design_from_analysis). Retro-requesting rows then share
    one interleaved Retro* search per group, as in DesignServer.

    Same submit()/DesignHandle surface and result schema as
    DesignServer — callers switch with GeneratingArguments
    continuous_batching: true."""

    def __init__(self, model, frozen, trainable, tokenizer, *,
                 slots: int = 8, chunk_steps: int = 8,
                 design_batch: int = 8, max_wait_s: float = 0.05,
                 cache_len: int = 1024,
                 prompt_buckets=(64, 128, 256, 512),
                 gen: GenerationSettings = GenerationSettings(),
                 rollback: bool = True, seed: int = 0,
                 shared_prefix_text: Optional[str] = None,
                 retro_topk: int = 50, retro_iterations: int = 100,
                 retro_max_time: float = 30.0, retro_width: int = 8):
        from .models.gllm.continuous import SlotDecoder

        if gen.repetition_penalty != 1.0:
            # the slot pool has no repetition-penalty support; failing
            # here beats silently decoding differently from DesignServer
            raise ValueError(
                "continuous batching does not support repetition_penalty"
                " != 1.0 — use the full-batch DesignServer")
        self.model = model
        self.frozen = frozen
        self.trainable = trainable
        self.tokenizer = tokenizer
        self.design_batch = int(design_batch)
        self.max_wait_s = float(max_wait_s)
        self.gen = gen
        self.rollback = rollback
        self.retro_topk = retro_topk
        self.retro_iterations = retro_iterations
        self.retro_max_time = retro_max_time
        self.retro_width = retro_width
        llm_params, lora, lscale = model._llm_params(trainable, frozen)
        # e.g. the deployment's fixed instruction header: its KV rows
        # prefill once; matching prompts prefill suffix-only
        prefix_ids = (tokenizer.encode(shared_prefix_text)
                      if shared_prefix_text else None)
        # buckets are a compile detail — drop the ones a small
        # cache_len cannot hold (incl. the prefix overhead) instead of
        # bouncing the whole server
        budget = cache_len - gen.max_new_tokens - len(prefix_ids or ())
        fitting = tuple(b for b in prompt_buckets if b <= budget)
        self.decoder = SlotDecoder(
            model.llm, llm_params, slots=slots, cache_len=cache_len,
            max_new_tokens=gen.max_new_tokens,
            eos_ids=model._eos_ids(), pad_id=tokenizer.pad_token_id,
            temperature=gen.temperature, top_p=gen.top_p, top_k=gen.top_k,
            do_sample=gen.do_sample, chunk_steps=chunk_steps,
            prompt_buckets=fitting or tuple(prompt_buckets),
            lora=lora, lora_scale=lscale,
            shared_prefix=prefix_ids,
            seed=seed)
        self._rng = jax.random.PRNGKey(seed + 1)
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._rid_pending: Dict[int, _Pending] = {}
        self._ready: List[tuple] = []   # (deadline, pending, tokens)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        # downstream stages run on their own workers so the scheduler
        # keeps admitting/decoding meanwhile; one worker per stage =>
        # no intra-stage contention, and the device stream interleaves
        # decode chunks with diffusion/retro work naturally. BOUNDED
        # queues keep backpressure: a slow stage fills its queue, the
        # scheduler stops flushing (and then admitting), and waiting
        # requests queue at the submission boundary instead of
        # accumulating decoded groups without limit.
        self._design_queue: "queue.Queue[list]" = queue.Queue(maxsize=4)
        self._design_thread: Optional[threading.Thread] = None
        self._retro_queue: "queue.Queue[tuple]" = queue.Queue(maxsize=8)
        self._retro_thread: Optional[threading.Thread] = None
        self.batches_run = 0
        self.requests_served = 0
        self._lat = _LatencyStats()

    def _extra_stats(self) -> Dict[str, Any]:
        return {"decode_chunks_run": self.decoder.chunks_run}

    def _put_stop_aware(self, q: "queue.Queue", item) -> bool:
        """Blocking put that gives up when the server stops (a full
        queue whose consumer has exited must not wedge a worker);
        returns False when the item was NOT enqueued."""
        while not self._stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def start(self) -> "ContinuousDesignServer":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self._design_thread = threading.Thread(target=self._design_loop,
                                               daemon=True)
        self._design_thread.start()
        self._retro_thread = threading.Thread(target=self._retro_loop,
                                              daemon=True)
        self._retro_thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        threads = [self._thread, self._design_thread, self._retro_thread]
        for th in threads:
            if th is not None:
                th.join(timeout=60)
        self._drain_in_flight()
        # a stage that outlived its join (e.g. a minutes-long first-jit
        # or a long Retro* iteration) can still hand work downstream
        # after the drain — keep sweeping until every worker is dead,
        # so no waiter ever hangs on a stopped server
        deadline = time.monotonic() + 60
        while any(th is not None and th.is_alive() for th in threads) \
                and time.monotonic() < deadline:
            time.sleep(0.1)
            self._drain_in_flight()
        self._drain_in_flight()

    def _drain_in_flight(self) -> None:
        """Resolve everything queued, decoding, waiting for a design
        group, or waiting on a retro search."""
        for p in list(self._rid_pending.values()):
            self._resolve_error(p, "server stopped")
        self._rid_pending.clear()
        for _, p, _t in self._ready:
            self._resolve_error(p, "server stopped")
        self._ready.clear()
        self._drain_queue(self._queue)
        self._drain_queue(self._design_queue,
                          extract=lambda group: [p for p, _t in group])
        self._drain_queue(self._retro_queue,
                          extract=lambda item: [p for p, _s in item[0]])

    # -- scheduler side --------------------------------------------------------
    def _loop(self) -> None:
        while not self._stop.is_set():
            moved = False
            # admit queued requests into the decode pool — unless the
            # completed-analysis backlog says downstream is saturated
            # (backpressure: let requests wait in the submission queue
            # instead of as decoded token buffers)
            while len(self._ready) < 4 * self.design_batch:
                try:
                    p = self._queue.get_nowait()
                except queue.Empty:
                    break
                try:
                    rid = self.decoder.submit(p.prompt_ids)
                except ValueError as e:   # e.g. prompt exceeds every bucket
                    self._resolve_error(p, str(e))
                else:
                    self._rid_pending[rid] = p
                moved = True
            if not self.decoder.idle:
                try:
                    for rid, toks, _trig in self.decoder.step():
                        pending = self._rid_pending.pop(rid, None)
                        if pending is None:
                            # orphan from an earlier errored step —
                            # its request was already resolved
                            continue
                        self._ready.append(
                            (time.monotonic() + self.max_wait_s,
                             pending, toks))
                        moved = True
                except Exception as e:   # decode batch must not kill serving
                    logger.exception("continuous decode failed: %s", e)
                    for rid, p in list(self._rid_pending.items()):
                        self._resolve_error(p, str(e))
                    self._rid_pending.clear()
            flush = ((len(self._ready) >= self.design_batch
                      or (self._ready
                          and (self._ready[0][0] <= time.monotonic()
                               or (self.decoder.idle
                                   and self._queue.empty()))))
                     # backpressure: never block the scheduler on a
                     # full design queue — keep decoding instead
                     and not self._design_queue.full())
            if flush:
                group = self._ready[:self.design_batch]
                self._ready = self._ready[self.design_batch:]
                # hand to the design worker: the scheduler goes straight
                # back to admitting/decoding while GraphDiT samples
                if not self._put_stop_aware(
                        self._design_queue, [(p, t) for _, p, t in group]):
                    for _, p, _t in group:
                        self._resolve_error(p, "server stopped")
                moved = True
            if not moved:
                time.sleep(0.005)

    def _design_loop(self) -> None:
        while not self._stop.is_set():
            try:
                group = self._design_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                self._run_design(group)
            except Exception as e:   # a bad group must not kill the worker
                logger.exception("design stage failed: %s", e)
                for p, _t in group:
                    self._resolve_error(p, str(e))

    def _run_design(self, rows) -> None:
        """Stage 2 for a group of completed analyses (padded to the
        fixed design_batch so the jitted stages compile once)."""
        n_real = len(rows)
        padded = rows + [rows[-1]] * (self.design_batch - n_real)
        prompts = [p.prompt_ids for p, _ in padded]
        analyses = [list(map(int, t)) for _, t in padded]
        props = np.stack([p.properties for p, _ in padded])
        self._rng, sub = jax.random.split(self._rng)
        smiles = self.model.design_from_analysis(
            self.frozen, self.trainable, sub, prompts, analyses,
            props, gen=self.gen, rollback=self.rollback, true_b=n_real)

        for i, (p, toks) in enumerate(rows):
            result = {
                "text": self.tokenizer.decode(list(map(int, toks)),
                                              skip_special_tokens=True),
                "smiles": smiles[i],
            }
            if not p.retro or smiles[i] is None:
                if p.retro:
                    result["retro"] = _retro_payload({})
                self._lat.record(p.resolve(result))
            else:
                p.result = result   # resolved after the retro phase

        retro_rows = [(p, smiles[i]) for i, (p, _) in enumerate(rows)
                      if p.retro and smiles[i] is not None]
        if retro_rows:
            # hand the (possibly minutes-long) search to the retro
            # worker; this design worker goes straight back to sampling
            self._rng, sub2 = jax.random.split(self._rng)
            if not self._put_stop_aware(self._retro_queue,
                                        (retro_rows, sub2)):
                for p, _smi in retro_rows:
                    if not p.event.is_set():
                        # keep the finished design result; only the
                        # route is missing
                        p.result["retro"] = _retro_payload({})
                        p.result["error"] = ("server stopped before "
                                             "retrosynthesis")
                        self._lat.record(p.resolve(p.result))
        self.batches_run += 1
        self.requests_served += n_real

    def _retro_loop(self) -> None:
        while not self._stop.is_set():
            try:
                retro_rows, sub = self._retro_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                plans = self.model.retrosynthesize_batch(
                    self.frozen, self.trainable, sub,
                    [smi for _, smi in retro_rows],
                    expansion_topk=self.retro_topk,
                    iterations=self.retro_iterations,
                    max_planning_time=self.retro_max_time,
                    rollback=False, gen=self.gen,
                    total_width=self.retro_width)
            except Exception as e:   # a bad search must not kill the worker
                logger.exception("retro search failed: %s", e)
                plans = {}
            for p, smi in retro_rows:
                p.result["retro"] = _retro_payload(plans.get(smi, {}))
                self._lat.record(p.resolve(p.result))


def serve_jsonl(config_path: Optional[str] = None,
                in_stream=None, out_stream=None) -> None:
    """JSONL stdin/stdout serving loop (main.py serve entry).

    Reads one JSON request per line, answers in completion order with
    an added "id" echoing the input line number. A blank line or EOF
    shuts the server down cleanly.
    """
    in_stream = in_stream if in_stream is not None else sys.stdin
    out_stream = out_stream if out_stream is not None else sys.stdout

    server = _build_server(config_path)
    try:
        serve_stream(server, in_stream, out_stream)
    finally:
        server.stop()


def _build_server(config_path: Optional[str]):
    """Config -> started design server (one model; DesignServer or
    ContinuousDesignServer per generating_args.continuous_batching).
    Shared by the stdio and TCP entry points."""
    from .config import get_infer_args
    from .models.loader import build_graph_lm

    model_args, data_args, _training_args, finetuning_args, \
        generating_args = get_infer_args(config_path)
    model, frozen, trainable, tok = build_graph_lm(
        model_args, data_args, finetuning_args, generate_mode=True,
        load_adapter=bool(model_args.adapter_name_or_path))
    gen = GenerationSettings(
        max_new_tokens=generating_args.max_new_tokens,
        temperature=generating_args.temperature,
        top_p=generating_args.top_p,
        top_k=generating_args.top_k,
        do_sample=generating_args.do_sample,
        repetition_penalty=generating_args.repetition_penalty,
        speculative_tokens=generating_args.speculative_tokens,
        speculative_ngram=generating_args.speculative_ngram)
    ga = generating_args
    if getattr(ga, "continuous_batching", False):
        return ContinuousDesignServer(
            model, frozen, trainable, tok, gen=gen,
            slots=ga.serve_batch_size,
            design_batch=ga.serve_batch_size,
            chunk_steps=ga.serve_chunk_steps,
            cache_len=ga.serve_cache_len,
            max_wait_s=ga.serve_max_wait_s,
            shared_prefix_text=ga.shared_prefix_text).start()
    return DesignServer(
        model, frozen, trainable, tok, gen=gen,
        batch_size=ga.serve_batch_size,
        max_wait_s=ga.serve_max_wait_s).start()


def serve_stream(server, in_stream, out_stream,
                 join_timeout: float = 600.0) -> None:
    """Drive one JSONL request/response stream against a running
    server (the per-connection loop shared by stdio and TCP)."""
    lock = threading.Lock()
    threads: List[threading.Thread] = []

    def respond(req_id: int, handle: DesignHandle) -> None:
        result = handle.result()
        result["id"] = req_id
        with lock:
            out_stream.write(json.dumps(result) + "\n")
            out_stream.flush()

    for n, line in enumerate(in_stream):
        line = line.strip()
        if not line:
            break
        # one malformed line must not take down the loop (or orphan
        # the in-flight requests already submitted)
        try:
            req = json.loads(line)
            if not isinstance(req, dict):
                # '42' / '[1,2]' parse fine but aren't requests — a
                # dict-method AttributeError would escape the except
                # tuple and kill the stream
                raise ValueError(
                    f"expected a JSON object, got {type(req).__name__}")
            if req.get("stats") is True:   # strict bool, like 'retro'
                # ops probe: {"stats": true} answers inline with the
                # server counters + latency percentiles (no decode)
                with lock:
                    out_stream.write(json.dumps(
                        {"id": n, **server.stats()}) + "\n")
                    out_stream.flush()
                continue
            retro = req.get("retro", False)
            if not isinstance(retro, bool):
                # "false"/1/etc. would silently trigger (or skip) a
                # minutes-long search — reject ambiguous values
                raise ValueError(
                    f"'retro' must be a JSON boolean, got {retro!r}")
            handle = server.submit(req["prompt"], req.get("property"),
                                   retro=retro)
        except (json.JSONDecodeError, KeyError, TypeError,
                ValueError) as e:
            with lock:
                out_stream.write(json.dumps(
                    {"id": n, "error": f"bad request: {e}"}) + "\n")
                out_stream.flush()
            continue
        t = threading.Thread(target=respond, args=(n, handle),
                             daemon=True)
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=join_timeout)


def make_tcp_server(server, host: str = "127.0.0.1", port: int = 7733):
    """A ThreadingTCPServer where every connection speaks the JSONL
    protocol against ONE shared design server — concurrent clients'
    requests co-batch on the device, which is the whole point. Returns
    the socketserver (caller runs serve_forever / shutdown)."""
    import socketserver

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            import io as _io
            rin = _io.TextIOWrapper(self.rfile, encoding="utf-8")
            rout = _io.TextIOWrapper(self.wfile, encoding="utf-8",
                                     write_through=True)
            try:
                serve_stream(server, rin, rout)
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away; its submitted work completes

    class _TCP(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    return _TCP((host, port), Handler)


def serve_tcp(config_path: Optional[str] = None, *,
              host: str = "127.0.0.1", port: int = 7733) -> None:
    """`python main.py serve cfg.yaml --tcp [PORT]`: the JSONL protocol
    over TCP. One model, one batching server, many clients."""
    server = _build_server(config_path)
    tcp = make_tcp_server(server, host, port)
    logger.info("serving JSONL over tcp://%s:%d", *tcp.server_address)
    try:
        tcp.serve_forever()
    finally:
        tcp.server_close()
        server.stop()
