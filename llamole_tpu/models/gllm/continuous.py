"""Slot-based continuous decoding (in-flight batching) for serving.

generate() decodes one fixed batch: every row waits for the slowest
row, and a request arriving mid-decode waits for the whole batch. On
TPU the production alternative keeps a FIXED pool of decode slots
(static shapes, one compiled step program) and streams requests
through it:

  * admit  — prefill a request's prompt (per-length-bucket program)
             and scatter its KV rows into a free slot
  * chunk  — advance ALL active slots by n steps in one jitted scan
             (per-row cache write offsets: model._cache_append /
             forward() accept a [B] cache_index)
  * retire — rows that hit a stop token or their budget free their
             slot immediately; the next request takes it without
             waiting for the rest of the pool

With real weights, analysis decodes stop at a trigger token after a
few dozen tokens with high variance — slot reuse converts that
variance into throughput instead of head-of-line waiting. The
reference has no serving surface beyond one-at-a-time Gradio
(launch.py:116-238); this is the TPU-native production pattern
(vLLM-style continuous batching, static-shape edition).

Greedy/sampled semantics per row are IDENTICAL to generate()'s scan
path (same prefill -> first token -> per-token loop; parity locked in
tests/test_continuous.py). Speculative drafting is a batch-level
optimization and stays off here; repetition_penalty is not supported
(its per-row seen-token state doesn't survive slot reuse —
ContinuousDesignServer refuses such settings rather than silently
decoding differently from the full-batch path).
"""

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import LLM, _sample_token, forward, make_kv_cache, match_lora_layout

Params = Dict[str, Any]


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds the largest bucket "
                     f"{buckets[-1]}")


class SlotDecoder:
    """Fixed-pool continuous decoder over one LLM.

    Host API (single-threaded; callers serialize):
      submit(prompt_ids) -> request id
      step() -> [(request_id, tokens np[int32], trigger int)]
      drain() -> run steps until every submitted request finished
    """

    def __init__(self, llm: LLM, params: Params, *,
                 slots: int = 8, cache_len: int = 1024,
                 max_new_tokens: int = 128,
                 eos_ids: Tuple[int, ...] = (), pad_id: int = 0,
                 temperature: float = 0.6, top_p: float = 0.9,
                 top_k: int = 0, do_sample: bool = True,
                 chunk_steps: int = 8,
                 prompt_buckets: Sequence[int] = (64, 128, 256, 512),
                 lora: Optional[Params] = None, lora_scale: float = 1.0,
                 shared_prefix: Optional[Sequence[int]] = None,
                 seed: int = 0):
        """shared_prefix: token ids every (or most) prompts start with —
        the chat template header / system block. Its KV rows prefill
        ONCE at construction; admissions that start with the prefix
        prefill only their suffix (attending over the stored rows) and
        copy prefix + suffix into the slot together. Prompts that don't
        match fall back to the full-prompt path (same outputs either
        way — prefix reuse is a pure compute saving)."""
        prefix_len = len(shared_prefix) if shared_prefix else 0
        if prefix_len and llm.cfg.sliding_window is not None:
            # suffix left-padding shifts suffix slots but not prefix
            # slots, breaking the slot-distance == position-distance
            # identity the sliding-window mask relies on
            raise ValueError(
                "shared_prefix is not supported with sliding-window "
                "configs (gemma2) — admit full prompts instead")
        if max_new_tokens + max(prompt_buckets) + prefix_len > cache_len:
            raise ValueError(
                f"cache_len={cache_len} cannot hold the largest prompt "
                f"bucket {max(prompt_buckets)} plus max_new_tokens="
                f"{max_new_tokens}"
                + (f" plus shared prefix {prefix_len}" if prefix_len
                   else ""))
        self.llm = llm
        self.params = params
        self.slots = int(slots)
        self.cache_len = int(cache_len)
        self.max_new = int(max_new_tokens)
        self.eos_arr = jnp.asarray(list(eos_ids) or [-1], jnp.int32)
        self.pad_id = int(pad_id)
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.top_k = int(top_k)
        self.do_sample = bool(do_sample)
        self.chunk_steps = int(chunk_steps)
        self.buckets = tuple(sorted(prompt_buckets))
        self.lora = match_lora_layout(params, lora)
        self.lora_scale = float(lora_scale)
        self._rng = jax.random.PRNGKey(seed)
        self._stacked = "layers_stacked" in params

        # device state ------------------------------------------------------
        self.cache = self._make_cache(self.slots, self.cache_len)
        S = self.slots
        self.state = {
            "tok": jnp.full((S,), self.pad_id, jnp.int32),
            "pos": jnp.zeros((S,), jnp.int32),       # rope position
            "widx": jnp.zeros((S,), jnp.int32),      # cache write offset
            "count": jnp.zeros((S,), jnp.int32),     # tokens emitted
            "done": jnp.ones((S,), bool),
            "active": jnp.zeros((S,), bool),
            "trigger": jnp.full((S,), -1, jnp.int32),
            "kv_valid": jnp.zeros((S, self.cache_len), bool),
            "out": jnp.full((S, self.max_new), self.pad_id, jnp.int32),
        }

        # shared-prefix KV rows (computed once) -------------------------------
        self._prefix: List[int] = list(shared_prefix or [])
        self._prefix_cache = None
        self._prefix_valid = None
        if self._prefix:
            ids = jnp.asarray(np.asarray(self._prefix, np.int32)[None, :])
            self._prefix_cache, self._prefix_valid = self._prefill_prefix(
                self.params, ids)

        # host bookkeeping ---------------------------------------------------
        self._next_id = 0
        self._pending: List[Tuple[int, List[int]]] = []
        self._slot_req: List[Optional[int]] = [None] * S
        self._free = list(range(S))
        self.chunks_run = 0

    # -- cache construction --------------------------------------------------
    def _make_cache(self, batch: int, total: int):
        return make_kv_cache(self.llm.cfg, batch, total, self.llm.dtype,
                             self._stacked)

    # -- jitted programs ------------------------------------------------------
    def _prefill_core(self, params, ids, mask, rng, prefix_cache,
                      prefix_valid):
        """Shared prefill math: returns (staged cache, kv_valid row,
        first token, rope pos, done, trig). With prefix rows, the
        staged cache spans [1, P+bucket] and positions offset by P."""
        cfg = self.llm.cfg
        taxis = 2 if self._stacked else 1
        if prefix_cache is not None:
            P = prefix_valid.shape[1]
            zeros = self._make_cache(1, ids.shape[1])
            staged = jax.tree.map(
                lambda pc, z: jnp.concatenate([pc, z], axis=taxis),
                prefix_cache, zeros)
            kvv = jnp.concatenate([prefix_valid, mask > 0], axis=1)
            positions = P + jnp.clip(jnp.cumsum(mask, -1) - 1, 0, None)
            cache_index = jnp.asarray(P, jnp.int32)
        else:
            staged = self._make_cache(1, ids.shape[1])
            kvv = mask > 0
            positions = jnp.clip(jnp.cumsum(mask, -1) - 1, 0, None)
            cache_index = jnp.asarray(0, jnp.int32)
        logits, _, staged = forward(
            params, cfg, input_ids=ids, positions=positions,
            kv_cache=staged, cache_index=cache_index,
            kv_valid=kvv, lora=self.lora, lora_scale=self.lora_scale,
            last_logits_only=True)
        tok = _sample_token(rng, logits[:, -1], self.temperature,
                            self.top_p, self.top_k, self.do_sample)
        done = jnp.isin(tok, self.eos_arr)
        trig = jnp.where(done, tok, -1).astype(jnp.int32)
        tok = jnp.where(done, self.pad_id, tok)
        pos = positions[:, -1] + 1
        return staged, kvv, tok[0], pos[0], done[0], trig[0]

    @functools.partial(jax.jit, static_argnums=(0,))
    def _prefill_prefix(self, params, ids):
        """Compute the shared prefix's KV rows once (all tokens real)."""
        cfg = self.llm.cfg
        P = ids.shape[1]
        mask = jnp.ones((1, P), jnp.int32)
        staged = self._make_cache(1, P)
        _, _, staged = forward(
            params, cfg, input_ids=ids,
            positions=jnp.arange(P, dtype=jnp.int32)[None, :],
            kv_cache=staged, cache_index=jnp.asarray(0, jnp.int32),
            kv_valid=mask > 0, lora=self.lora, lora_scale=self.lora_scale,
            last_logits_only=True)
        return staged, mask > 0

    # cache/state donated: the pool cache is ~0.5 GB at the 8B serving
    # shape — without donation every admission copies it. ONE program
    # runs the prefill forward AND scatters the result into the pool
    # (cache rows + all slot-state leaves): over the axon tunnel each
    # extra dispatch is a round trip, and fusing prefill+admit means an
    # admission is a single ASYNC dispatch — the host never blocks on it
    # (the old flow synced per admission to check the prefill-stop case;
    # that case now retires through the normal chunk/retire path).
    @functools.partial(jax.jit, static_argnums=(0,),
                       static_argnames=("bucket",),
                       donate_argnums=(2, 3))
    def _prefill_admit(self, params, cache, state, ids, mask, slot, rng,
                       written, prefix_cache, prefix_valid, *, bucket):
        """Prefill ids/mask [1, bucket] (left-padded) and scatter the
        result into slot `slot` (traced), seeding its decode state.
        prefix_cache/prefix_valid are None for the full-prompt path
        (None is an empty pytree — the two paths compile separately)."""
        del bucket
        staged, staged_valid, tok, pos, done, trig = self._prefill_core(
            params, ids, mask, rng, prefix_cache, prefix_valid)
        bax = 1 if self._stacked else 0

        def upd(big, small):
            start = [jnp.asarray(0, jnp.int32)] * big.ndim
            start[bax] = slot
            return jax.lax.dynamic_update_slice(
                big, small.astype(big.dtype), tuple(start))

        cache = jax.tree.map(upd, cache, staged)
        row = jnp.zeros((self.cache_len,), bool).at[
            :staged_valid.shape[1]].set(staged_valid[0])
        state = dict(state)
        state["kv_valid"] = state["kv_valid"].at[slot].set(row)
        state["tok"] = state["tok"].at[slot].set(tok)
        state["pos"] = state["pos"].at[slot].set(pos)
        state["widx"] = state["widx"].at[slot].set(written)
        state["count"] = state["count"].at[slot].set(0)
        state["done"] = state["done"].at[slot].set(done)
        state["trigger"] = state["trigger"].at[slot].set(trig)
        state["active"] = state["active"].at[slot].set(True)
        return cache, state

    # cache/state donated: chunk steps rewrite them wholesale anyway.
    # Early-exit while_loop instead of a fixed-length scan: the loop
    # stops the moment a slot becomes retirable (stop_on_retire — i.e.
    # requests are waiting for a slot) or when every slot is finished,
    # so a dispatch never runs useless steps past a stop and the host
    # never pays a tunnel round trip just to discover "nothing retired
    # yet, chunk again" (the round-3 measured loss mode: 8-step chunks
    # + per-chunk host reads lost 0.85x to full-batch cycles).
    @functools.partial(jax.jit, static_argnums=(0,),
                       static_argnames=("max_steps", "stop_on_retire"),
                       donate_argnums=(2, 3))
    def _chunk_until(self, params, cache, state, rng, *, max_steps,
                     stop_on_retire):
        cfg = self.llm.cfg
        S = self.slots
        rows = jnp.arange(S)

        def cond(carry):
            cache, st, rng, i = carry
            running_any = jnp.any(st["active"] & ~st["done"])
            go = (i < max_steps) & running_any
            if stop_on_retire:
                go &= ~jnp.any(st["active"] & st["done"])
            return go

        def body(carry):
            cache, st, rng, i = carry
            running = st["active"] & ~st["done"]
            # emit the pending token (sampled last step / at prefill)
            cidx = jnp.clip(st["count"], 0, self.max_new - 1)
            out = st["out"].at[rows, cidx].set(
                jnp.where(running, st["tok"], st["out"][rows, cidx]))
            widx_c = jnp.clip(st["widx"], 0, self.cache_len - 1)
            kvv = st["kv_valid"].at[rows, widx_c].set(
                jnp.where(running, True, st["kv_valid"][rows, widx_c]))
            logits, _, cache = forward(
                params, cfg, input_ids=st["tok"][:, None],
                positions=st["pos"][:, None], kv_cache=cache,
                cache_index=st["widx"], kv_valid=kvv,
                lora=self.lora, lora_scale=self.lora_scale)
            rng, sub = jax.random.split(rng)
            nxt = _sample_token(sub, logits[:, -1], self.temperature,
                                self.top_p, self.top_k, self.do_sample)
            stopped = running & jnp.isin(nxt, self.eos_arr)
            emitted = st["count"] + running.astype(jnp.int32)
            budget = running & (emitted >= self.max_new)
            done = st["done"] | stopped | budget
            trig = jnp.where(stopped, nxt, st["trigger"])
            nxt = jnp.where(done | ~running, self.pad_id, nxt)
            st = {"tok": jnp.where(running, nxt, st["tok"]),
                  "pos": st["pos"] + running,
                  "widx": st["widx"] + running,
                  "count": emitted,
                  "done": done, "active": st["active"], "trigger": trig,
                  "kv_valid": kvv, "out": out}
            return (cache, st, rng, i + 1)

        cache, state, rng, _ = jax.lax.while_loop(
            cond, body, (cache, state, rng, jnp.asarray(0, jnp.int32)))
        return cache, state, rng

    # -- host API --------------------------------------------------------------
    def max_prompt_len(self, prompt_ids: Sequence[int]) -> int:
        """Longest admissible prompt for THIS prompt (prefix hits get
        the prefix length on top of the largest suffix bucket)."""
        P = len(self._prefix)
        if P and len(prompt_ids) > P and list(prompt_ids[:P]) == self._prefix:
            return P + self.buckets[-1]
        return self.buckets[-1]

    def submit(self, prompt_ids: Sequence[int]) -> int:
        """Queue a request; raises ValueError IMMEDIATELY for prompts
        that exceed every bucket (validating here keeps a bad request
        from ever holding a decode slot)."""
        ids = list(prompt_ids)
        if len(ids) > self.max_prompt_len(ids):
            raise ValueError(
                f"prompt length {len(ids)} exceeds the largest bucket "
                f"{self.buckets[-1]}")
        rid = self._next_id
        self._next_id += 1
        self._pending.append((rid, ids))
        return rid

    @property
    def idle(self) -> bool:
        return not self._pending and all(r is None for r in self._slot_req)

    def _admit_pending(self) -> None:
        """Admit queued requests into free slots. Each admission is ONE
        async dispatch (_prefill_admit) — the host never blocks here;
        a request that stops straight out of prefill retires through
        the normal chunk/retire path (the chunk's early-exit condition
        sees it immediately without running a step)."""
        while self._pending and self._free:
            rid, ids = self._pending.pop(0)
            # shared-prefix hit: prefill only the suffix (the prefix KV
            # rows are already computed); at least one suffix token must
            # remain so the first sample has a query position
            P = len(self._prefix)
            hit = (P > 0 and len(ids) > P
                   and list(ids[:P]) == self._prefix)
            tail = ids[P:] if hit else ids
            # resolve the bucket BEFORE claiming a slot: a raise here
            # (submit() validates, but belt-and-braces) must not leak
            # the slot out of the free pool forever
            L = _bucket(len(tail), self.buckets)
            slot = self._free.pop(0)
            row = np.full((1, L), self.pad_id, np.int32)
            mask = np.zeros((1, L), np.int32)
            row[0, L - len(tail):] = tail
            mask[0, L - len(tail):] = 1
            self._rng, sub = jax.random.split(self._rng)
            written = (P + L) if hit else L
            self.cache, self.state = self._prefill_admit(
                self.params, self.cache, self.state,
                jnp.asarray(row), jnp.asarray(mask),
                jnp.asarray(slot, jnp.int32), sub,
                jnp.asarray(written, jnp.int32),
                self._prefix_cache if hit else None,
                self._prefix_valid if hit else None, bucket=L)
            self._slot_req[slot] = rid

    def _retire(self) -> List[Tuple[int, np.ndarray, int]]:
        # one host sync for the flags, a second only when something
        # actually retires (tunnel round trips are the serving tax)
        done, active = jax.device_get((self.state["done"],
                                       self.state["active"]))
        out = None
        finished = []
        for slot, rid in enumerate(self._slot_req):
            if rid is None or not (active[slot] and done[slot]):
                continue
            if out is None:
                out, counts, trigs = jax.device_get(
                    (self.state["out"], self.state["count"],
                     self.state["trigger"]))
            toks = np.asarray(out[slot, :counts[slot]], np.int32)
            finished.append((rid, toks, int(trigs[slot])))
            self.state["active"] = self.state["active"].at[slot].set(False)
            self._slot_req[slot] = None
            self._free.append(slot)
        return finished

    def step(self, run_to_completion: bool = False) \
            -> List[Tuple[int, np.ndarray, int]]:
        """Admit + one decode chunk + retire. Returns finished requests
        as (request_id, new_tokens, trigger_token_or_-1).

        The chunk dispatch exits early the moment a slot is retirable
        while requests are queued (so admissions never wait on finished
        rows), and otherwise runs up to chunk_steps — or, with
        run_to_completion (drain's no-more-work endgame), until every
        active slot has finished, in one dispatch."""
        self._admit_pending()
        finished = []
        if any(r is not None for r in self._slot_req):
            waiting = bool(self._pending)
            # waiting: the pool is full (admission precedes the chunk) and
            # only a retirement can unblock the queue — run until one
            # happens. run_to_completion: nothing else is coming — run
            # until every slot finishes. Otherwise (server polling):
            # bounded chunk_steps hop so the caller regains control.
            max_steps = (self.max_new if (waiting or run_to_completion)
                         else self.chunk_steps)
            self._rng, sub = jax.random.split(self._rng)
            self.cache, self.state, _ = self._chunk_until(
                self.params, self.cache, self.state, sub,
                max_steps=max_steps, stop_on_retire=waiting)
            self.chunks_run += 1
        finished.extend(self._retire())
        return finished

    def drain(self) -> Dict[int, Tuple[np.ndarray, int]]:
        results: Dict[int, Tuple[np.ndarray, int]] = {}
        while not self.idle:
            for rid, toks, trig in self.step(run_to_completion=True):
                results[rid] = (toks, trig)
        return results
