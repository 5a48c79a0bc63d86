"""GraphLM: the composite multimodal model.

Counterpart of the reference GraphLLMForCausalMLM
(src/model/modeling_llamole.py:68-1287): a frozen LLM with a LoRA
overlay + three frozen graph modules + three trainable MLP connectors.

Training forward (modeling_llamole.py:299-437):
  1. embed tokens, splice graph-encoder embeddings at <molecule> slots
  2. LM loss over masked labels
  3. design branch: mean hidden over the <design_body> query tokens ->
     lm_to_graph_decoder -> GraphDiT diffusion CE
  4. retro branch: mean hidden over <retro_body> tokens per step ->
     lm_to_graph_predictor -> template-label CE
  total = w_lm·lm + w_design·design + w_retro·retro
  (the reference mistakenly multiplies w_design by retro_loss at
   modeling_llamole.py:423; we implement the intended sum — divergence
   documented in SURVEY.md §7)

Generation (design path, modeling_llamole.py:584-718): AR analysis
decode -> append <design_start> + K×<design_body> -> re-forward for the
query hiddens -> connector -> GraphDiT sampler -> SMILES, with the
rollback fallback that asks the LLM for SMILES directly.

All device steps are jitted with static shapes; token surgery between
steps happens on the host (it is string-adjacent work anyway).
"""

import functools
import json
import os
from dataclasses import dataclass, replace as dc_replace
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import IGNORE_INDEX
from ..utils.logging import get_logger
from ..ops.nn import dense, dense_init
from .gllm import LLM, init_lora, lora_scale
from .gllm.model import extend_kv_cache, forward as llm_forward, lm_loss
from .graphclip import GraphCLIP
from .graphdit import GraphDiT
from .retro import GraphPredictor

logger = get_logger(__name__)


@dataclass
class GenerationSettings:
    max_new_tokens: int = 128
    temperature: float = 0.6
    top_p: float = 0.9
    top_k: int = 0
    do_sample: bool = True
    repetition_penalty: float = 1.0
    # prompt-lookup drafts/step: None = auto (on at K=2 for greedy
    # decode, guarded by the acceptance monitor; off for sampled), 0 =
    # force off, K>0 = force on
    speculative_tokens: Optional[int] = None
    speculative_ngram: int = 2
    # reuse the decode KV cache for the post-decode query re-forward
    # (design/retro): forward only the appended query tokens instead of
    # the whole prompt+analysis sequence. Falls back to the full
    # re-forward automatically when no cache is available (speculative
    # decode path, continuous serving). Off = always re-forward
    # (debug/parity knob).
    reuse_decode_cache: bool = True
    # failed diffusion assemblies redraw from the sampler this many
    # times (full-batch redraw — identical shapes, so the SAME compiled
    # executable, zero new tunnel compiles) before the LLM rollback
    # fallback. 0 = reference protocol (modeling_llamole.py:665 rolls
    # back immediately); the quality eval (eval/workflow.run_molqa)
    # opts into 2.
    design_resamples: int = 0


class GraphLM:
    def __init__(
        self,
        llm: LLM,
        graph_decoder: GraphDiT,
        graph_predictor: GraphPredictor,
        graph_encoder: GraphCLIP,
        tokenizer,
        token_id_dict: Dict[str, int],
        num_body_tokens: int = 8,
        loss_weight_lm: float = 1.0,
        loss_weight_design: float = 1.0,
        loss_weight_retro: float = 1.0,
        lora_rank: int = 8,
        lora_alpha: Optional[int] = None,
        finetuning_type: str = "lora",
        use_rslora: bool = False,
        use_dora: bool = False,
        pissa: bool = False,
        pipeline_mesh=None,
        pipeline_microbatches: int = 1,
        cost_mlp=None,
        cost_mlp_params=None,
    ):
        self.llm = llm
        self.graph_decoder = graph_decoder
        self.graph_predictor = graph_predictor
        self.graph_encoder = graph_encoder
        self.tokenizer = tokenizer
        self.token_id_dict = token_id_dict
        self.num_body_tokens = num_body_tokens
        self.loss_weight_lm = loss_weight_lm
        self.loss_weight_design = loss_weight_design
        self.loss_weight_retro = loss_weight_retro
        self.lora_rank = lora_rank
        self.lora_scale = lora_scale(lora_rank, lora_alpha,
                                     use_rslora=use_rslora)
        self.finetuning_type = finetuning_type
        self.use_dora = use_dora
        self.pissa = pissa
        self._pp_mesh = pipeline_mesh
        self._pp_microbatches = pipeline_microbatches
        # fingerprint->cost value model for the planner (reference
        # value_model, modeling_llamole.py:891-939; active when
        # molecule_cost_weight > 0)
        self.cost_mlp = cost_mlp
        self.cost_mlp_params = cost_mlp_params
        self._loss_traced = False

    def enable_pipeline(self, mesh, num_microbatches: int = 1) -> None:
        """Route the training LLM forward through the GPipe pipeline
        (parallel/pipeline.py) over the mesh's 'pp' axis. Must run
        before the first loss_fn trace: loss_fn is jitted with self as
        a static argument, so a later call could NOT retrace and
        training would silently run un-pipelined — guarded below
        (prefer the pipeline_mesh constructor argument)."""
        if self._loss_traced:
            raise RuntimeError(
                "enable_pipeline() after loss_fn was already traced — "
                "the jitted loss would keep the non-pipelined path. "
                "Pass pipeline_mesh= to the GraphLM constructor or call "
                "enable_pipeline before any loss_fn use.")
        if self.llm.cfg.num_experts > 0:
            raise ValueError(
                "pipeline parallelism does not plumb the MoE router "
                "load-balancing loss — experts would collapse silently. "
                "Use the ep axis for MoE models (mesh='ep:N,dp:M').")
        self._pp_mesh = mesh
        self._pp_microbatches = num_microbatches

    def _pipelined_lm(self, llm_params, embeds, attention_mask, lora,
                      lora_scale):
        """(logits, hidden) matching llm_forward, with the layer stack
        pipelined over pp."""
        from ..parallel.pipeline import pipeline_decoder_forward
        from .gllm.model import finalize_hidden

        cfg = self.llm.cfg
        positions = jnp.clip(
            jnp.cumsum(attention_mask, axis=-1) - 1, 0, None)
        x = pipeline_decoder_forward(
            llm_params, embeds, attention_mask, positions, cfg,
            self._pp_mesh, num_microbatches=self._pp_microbatches,
            lora=lora, lora_scale=lora_scale, train=True)
        return finalize_hidden(llm_params, cfg, x)

    # ------------------------------------------------------------------
    # parameter bundles
    # ------------------------------------------------------------------
    def init_trainable(self, key: jax.Array,
                       frozen: Optional[Dict] = None) -> Dict:
        """Trainable bundle by finetuning type (parity: adapter.py:270
        init_adapter — lora / freeze / full; graph modules always frozen,
        loader.py:241-242):
          lora   — LoRA overlay + connectors
          freeze — connectors only
          full   — the whole LLM + connectors (needs `frozen` to move the
                   LLM params into the trainable bundle)
        """
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lm_h = self.llm.cfg.hidden_size
        bundle: Dict = {
            "connectors": {
                "graph_to_lm": dense_init(k2, self.graph_encoder.hidden_size, lm_h),
                "lm_to_graph_decoder": dense_init(
                    k3, lm_h, self.graph_decoder.text_input_size),
                "lm_to_graph_predictor": dense_init(
                    k4, lm_h, self.graph_predictor.text_input_size),
            },
        }
        if self.finetuning_type == "lora":
            adapter = init_lora(k1, self.llm.cfg, rank=self.lora_rank)
            if self.pissa:
                from .gllm.lora import pissa_init
                if frozen is None:
                    raise ValueError("pissa_init needs the frozen bundle")
                frozen["llm"], adapter = pissa_init(
                    frozen["llm"], adapter, self.lora_scale)
                # stash the INITIAL adapter: save_pretrained converts the
                # trained adapter to a standard rank-2r LoRA over the
                # original weights (the residual base is never persisted)
                self._pissa_init_adapter = jax.tree.map(lambda x: x, adapter)
            if self.use_dora:
                from .gllm.lora import dora_init
                if frozen is None:
                    raise ValueError("use_dora needs the frozen bundle")
                adapter = dora_init(frozen["llm"], adapter,
                                    scale=self.lora_scale if self.pissa
                                    else 0.0)
            bundle["lora"] = adapter
        elif self.finetuning_type == "full":
            if frozen is None:
                raise ValueError("full finetuning needs the frozen bundle "
                                 "to take ownership of the LLM params")
            bundle["llm"] = frozen.pop("llm")
        elif self.finetuning_type != "freeze":
            raise ValueError(f"unknown finetuning_type {self.finetuning_type!r}")
        return bundle

    def _llm_params(self, trainable: Dict, frozen: Dict):
        """(llm_params, lora, lora_scale) resolved by finetuning type."""
        llm = trainable.get("llm", frozen.get("llm"))
        lora = trainable.get("lora")
        return llm, lora, self.lora_scale if lora is not None else 1.0

    def init_frozen(self, key: jax.Array) -> Dict:
        """Random-init frozen modules (tests / from-scratch runs)."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "llm": self.llm.init(k1),
            "graph_decoder": self.graph_decoder.init(k2),
            "graph_predictor": self.graph_predictor.init(k3),
            "graph_encoder": self.graph_encoder.init(k4),
        }

    # ------------------------------------------------------------------
    # shared pieces
    # ------------------------------------------------------------------
    def _splice_molecule_embeds(self, frozen, trainable, input_ids,
                                mol_atoms, mol_edges, mol_node_mask,
                                mol_valid, mol_rows, mol_cols):
        """Embed tokens and overwrite <molecule> positions with projected
        graph embeddings (modeling_llamole.py:325-341)."""
        llm_params, _, _ = self._llm_params(trainable, frozen)
        embeds = self.llm.embed(llm_params, input_ids)
        mol_embeds = self.graph_encoder(
            frozen["graph_encoder"], mol_atoms, mol_edges, mol_node_mask)
        mol_embeds = jax.nn.silu(
            dense(trainable["connectors"]["graph_to_lm"], mol_embeds))
        current = embeds[mol_rows, mol_cols]
        new_vals = jnp.where(mol_valid[:, None],
                             mol_embeds.astype(embeds.dtype), current)
        return embeds.at[mol_rows, mol_cols].set(new_vals)

    def _mean_body_hidden(self, hidden, rows, start_cols):
        """Mean of num_body_tokens hiddens following each start position."""
        k = self.num_body_tokens
        L = hidden.shape[1]
        cols = jnp.clip(start_cols[:, None] + 1 + jnp.arange(k)[None, :], 0, L - 1)
        return hidden[rows[:, None], cols].mean(axis=1)

    # ------------------------------------------------------------------
    # training loss
    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=("train",))
    def loss_fn(self, trainable: Dict, frozen: Dict, rng: jax.Array,
                batch: Dict[str, jnp.ndarray], train: bool = True):
        self._loss_traced = True   # trace-time: guards enable_pipeline
        input_ids = batch["input_ids"]
        b, L = input_ids.shape

        embeds = self._splice_molecule_embeds(
            frozen, trainable, input_ids,
            batch["mol_atoms"], batch["mol_edges"], batch["mol_node_mask"],
            batch["mol_valid"], batch["mol_rows"], batch["mol_cols"])

        llm_params, lora, lscale = self._llm_params(trainable, frozen)
        moe_aux = None
        if self._pp_mesh is not None:
            logits, hidden = self._pipelined_lm(
                llm_params, embeds, batch["attention_mask"], lora, lscale)
        elif self.llm.cfg.num_experts > 0:
            logits, hidden, _, moe_aux = llm_forward(
                llm_params, self.llm.cfg,
                inputs_embeds=embeds, attention_mask=batch["attention_mask"],
                lora=lora, lora_scale=lscale, train=True,
                return_moe_aux=True)
        else:
            logits, hidden, _ = llm_forward(
                llm_params, self.llm.cfg,
                inputs_embeds=embeds, attention_mask=batch["attention_mask"],
                lora=lora, lora_scale=lscale, train=True)
        lm = lm_loss(logits, batch["labels"], IGNORE_INDEX)
        if moe_aux is not None:
            # Mixtral router load-balancing term rides the LM loss
            # (reference: model_utils/moe.py:28-81 output_router_logits)
            lm = lm + self.llm.cfg.moe_aux_loss_coef * moe_aux

        # ---- design branch ------------------------------------------------
        rows = jnp.arange(b)
        d_start = batch["design_start_pos"]
        d_idx = jnp.clip(batch["design_graph_index"], 0, None)
        d_valid = (batch["design_start_pos"] >= 0) & (batch["design_graph_index"] >= 0)
        design_hidden = self._mean_body_hidden(hidden, rows, jnp.clip(d_start, 0, None))
        design_cond = jax.nn.silu(
            dense(trainable["connectors"]["lm_to_graph_decoder"], design_hidden))
        d_atoms = batch["mol_atoms"][d_idx]
        d_edges = batch["mol_edges"][d_idx]
        d_mask = batch["mol_node_mask"][d_idx] & d_valid[:, None]
        rng, k_design = jax.random.split(rng)
        design = self.graph_decoder.loss(
            frozen["graph_decoder"], k_design, d_atoms, d_edges, d_mask,
            batch["molecule_properties"],
            design_cond.astype(jnp.float32), train=train)

        # ---- retro branch ---------------------------------------------------
        retro_hidden = self._mean_body_hidden(
            hidden, batch["retro_rows"], batch["retro_cols"])
        retro_cond = jax.nn.silu(
            dense(trainable["connectors"]["lm_to_graph_predictor"], retro_hidden))
        retro_logits = self.graph_predictor(
            frozen["graph_predictor"], batch["retro_atoms"],
            batch["retro_edges"],
            batch["retro_node_mask"] & batch["retro_valid"][:, None],
            retro_cond)
        labels = jnp.clip(batch["retro_labels"], 0, retro_logits.shape[-1] - 1)
        logp = jax.nn.log_softmax(retro_logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        valid = batch["retro_valid"]
        retro = jnp.where(valid, nll, 0.0).sum() / jnp.clip(valid.sum(), 1, None)

        total = (self.loss_weight_lm * lm
                 + self.loss_weight_design * design
                 + self.loss_weight_retro * retro)
        return total, {"lm_loss": lm, "design_loss": design, "retro_loss": retro}

    # ------------------------------------------------------------------
    # generation: molecular design (phase 1)
    # ------------------------------------------------------------------
    def _generate_tokens(self, frozen, trainable, input_ids, attention_mask,
                         rng, gen: GenerationSettings, eos_ids,
                         inputs_embeds=None, want_state=False,
                         step_cap=None):
        llm_params, lora, lscale = self._llm_params(trainable, frozen)
        outs = self.llm.generate(
            llm_params, rng,
            jnp.asarray(input_ids), jnp.asarray(attention_mask),
            step_cap=step_cap,
            max_new_tokens=gen.max_new_tokens,
            temperature=gen.temperature, top_p=gen.top_p, top_k=gen.top_k,
            do_sample=gen.do_sample, eos_ids=tuple(eos_ids),
            pad_id=self.tokenizer.pad_token_id,
            lora=lora, lora_scale=lscale,
            inputs_embeds=inputs_embeds,
            repetition_penalty=gen.repetition_penalty,
            spec_tokens=gen.speculative_tokens,
            spec_ngram=gen.speculative_ngram,
            return_decode_state=want_state,
            # room for the query extension (<start> + K body tokens) so
            # _body_hidden_extend_jit never has to grow-copy the cache
            reserve_cache_slots=(1 + self.num_body_tokens) if want_state
            else 0)
        if want_state:
            toks, done, state = outs
            return np.asarray(toks), np.asarray(done), state
        toks, done = outs
        return np.asarray(toks), np.asarray(done)

    def _eos_ids(self) -> Tuple[int, ...]:
        """eos + every added special token stops decoding
        (parity: eval/workflow.py:96-99, mmsft/workflow.py:100-105)."""
        ids = [self.tokenizer.eos_token_id]
        ids.extend(self.tokenizer.additional_special_tokens_ids)
        return tuple(dict.fromkeys(int(i) for i in ids))

    def _strip_pads(self, row: np.ndarray) -> List[int]:
        pad = self.tokenizer.pad_token_id
        return [int(t) for t in row if int(t) != pad]

    def _left_pad(self, seqs: Sequence[Sequence[int]],
                  bucket: int = 64) -> Tuple[np.ndarray, np.ndarray]:
        """Left-pad to a bucketed length so repeated device calls reuse one
        compiled program per bucket instead of one per unique length."""
        pad = self.tokenizer.pad_token_id
        longest = max(max(len(s) for s in seqs), 1)
        width = ((longest + bucket - 1) // bucket) * bucket
        ids = np.full((len(seqs), width), pad, np.int32)
        mask = np.zeros((len(seqs), width), np.int32)
        for i, s in enumerate(seqs):
            if s:
                ids[i, -len(s):] = s
                mask[i, -len(s):] = 1
        return ids, mask

    @functools.partial(jax.jit, static_argnums=(0,))
    def _body_hidden_jit(self, frozen, trainable, input_ids, attention_mask):
        """Re-forward for the trailing num_body_tokens query hiddens."""
        llm_params, lora, lscale = self._llm_params(trainable, frozen)
        _, hidden, _ = llm_forward(
            llm_params, self.llm.cfg, input_ids=input_ids,
            attention_mask=attention_mask, lora=lora, lora_scale=lscale)
        return hidden[:, -self.num_body_tokens:].mean(axis=1)

    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=("grow",))
    def _body_hidden_extend_jit(self, frozen, trainable, cache, kv_valid,
                                ext_ids, grow: bool = True):
        """Query extension: forward ONLY the appended query tokens
        (<design_start> + K bodies, or the retro equivalent) on top of
        the decode KV cache instead of re-forwarding the whole
        prompt+analysis sequence — ~18x fewer re-forward tokens at the
        e2e bench shape; the 8B re-forward was seconds per batch.
        Numerically identical to _body_hidden_jit's re-forward: the
        decode cache's valid region per row is exactly prompt+analysis
        (generate never writes stop tokens), positions continue the
        rows' true lengths, and attention sees the same causal set.
        The reference re-forwards the full sequence every time
        (modeling_llamole.py:584-663).

        grow=False when the decode cache was allocated with
        reserve_cache_slots >= s (design_molecule's path): the grow-copy
        transiently doubled the 8B cache (~2 GB at b96) and tipped the
        e2e bench into OOM. grow=True handles exactly-full caches."""
        llm_params, lora, lscale = self._llm_params(trainable, frozen)
        b, s = ext_ids.shape
        t_old = kv_valid.shape[1]
        if grow:
            # cache may be exactly full — grow by s slots (O(cache) copy)
            cache = extend_kv_cache(cache, s)
            kv_valid = jnp.concatenate(
                [kv_valid, jnp.zeros((b, s), bool)], axis=1)
        # first free slot (the valid region is contiguous per row:
        # left-padded prompt suffix + generated tokens from slot P on)
        t_new = kv_valid.shape[1]
        idx_old = jnp.arange(t_old)[None, :]
        write = jnp.max(
            jnp.where(kv_valid[:, :t_old], idx_old + 1, 0), axis=1)  # [B]
        true_len = kv_valid.sum(axis=1)      # [B] next RoPE position
        idx_new = jnp.arange(t_new)[None, :]
        kv_valid = kv_valid | ((idx_new >= write[:, None])
                               & (idx_new < (write + s)[:, None]))
        positions = true_len[:, None] + jnp.arange(s)[None, :]
        _, hidden, _ = llm_forward(
            llm_params, self.llm.cfg, input_ids=ext_ids,
            attention_mask=jnp.ones((b, s), jnp.int32),
            positions=positions, kv_cache=cache, cache_index=write,
            kv_valid=kv_valid, lora=lora, lora_scale=lscale)
        return hidden[:, -self.num_body_tokens:].mean(axis=1)

    def _place_dp(self, arrays, mesh):
        """Pad row counts to the dp multiple and shard along dp so the
        jitted stages run data-parallel under GSPMD (returns placed
        arrays + original row count)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape.get("dp", 1)
        b = arrays[0].shape[0]
        pad = (-b) % dp
        out = []
        for a in arrays:
            a = np.asarray(a)
            if pad:
                a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
            out.append(jax.device_put(jnp.asarray(a),
                                      NamedSharding(mesh, P("dp"))))
        return out, b

    def design_molecule(
        self,
        frozen: Dict,
        trainable: Dict,
        rng: jax.Array,
        input_ids: np.ndarray,         # [B, P] left-padded prompt
        attention_mask: np.ndarray,
        molecule_properties: np.ndarray,  # [B, 10]
        gen: GenerationSettings = GenerationSettings(),
        rollback: bool = False,
        molecule_batch: Optional[Dict[str, np.ndarray]] = None,
        mesh=None,
    ) -> Tuple[np.ndarray, List[Optional[str]]]:
        """Phase-1 design: analysis decode -> query re-forward -> GraphDiT
        (parity: modeling_llamole.py:584-663). Returns (analysis_tokens,
        smiles_list). With `mesh`, every device stage runs dp-sharded
        (SURVEY §2.2: multi-chip sampling; batch padded to the dp
        multiple, pad rows dropped from outputs)."""
        rng, k_gen, k_diff = jax.random.split(rng, 3)
        true_b = np.asarray(input_ids).shape[0]
        if mesh is not None and molecule_batch is not None:
            # the spliced-embed path carries graph banks whose row indices
            # span the unpadded batch; run it unsharded rather than pad
            # the banks inconsistently (review finding)
            logger.warning("design_molecule: mesh ignored with "
                           "molecule_batch (spliced-embed path)")
            mesh = None
        if mesh is not None:
            (input_ids, attention_mask, molecule_properties), true_b = (
                self._place_dp(
                    [input_ids, attention_mask, molecule_properties], mesh))
        inputs_embeds = None
        if molecule_batch is not None:
            inputs_embeds = self._splice_molecule_embeds(
                frozen, trainable, jnp.asarray(input_ids),
                jnp.asarray(molecule_batch["mol_atoms"]),
                jnp.asarray(molecule_batch["mol_edges"]),
                jnp.asarray(molecule_batch["mol_node_mask"]),
                jnp.asarray(molecule_batch["mol_valid"]),
                jnp.asarray(molecule_batch["mol_rows"]),
                jnp.asarray(molecule_batch["mol_cols"]))
        outs = self._generate_tokens(
            frozen, trainable, input_ids, attention_mask, k_gen, gen,
            self._eos_ids(), inputs_embeds=inputs_embeds,
            want_state=gen.reuse_decode_cache)
        analysis, state = (outs[0], outs[2]) if gen.reuse_decode_cache \
            else (outs[0], None)
        input_ids = np.asarray(input_ids)

        design_hidden = None
        if state is not None:
            # query extension off the decode cache (see
            # _body_hidden_extend_jit); drop the cache ref immediately so
            # its HBM is free before the diffusion stage runs
            ext = np.full((analysis.shape[0], 1 + self.num_body_tokens),
                          self.token_id_dict["<design_body>"], np.int32)
            ext[:, 0] = self.token_id_dict["<design_start>"]
            design_hidden = self._body_hidden_extend_jit(
                frozen, trainable, state["cache"], state["kv_valid"],
                jnp.asarray(ext), grow=False)  # cache was reserve-allocated
            state = None

        prompts = [self._strip_pads(input_ids[i])
                   for i in range(analysis.shape[0])]
        analyses = [self._strip_pads(analysis[i])
                    for i in range(analysis.shape[0])]
        smiles = self.design_from_analysis(
            frozen, trainable, k_diff, prompts, analyses,
            molecule_properties, gen=gen, rollback=rollback, mesh=mesh,
            true_b=true_b, design_hidden=design_hidden)
        return analysis[:true_b], smiles

    def design_from_analysis(
        self,
        frozen: Dict,
        trainable: Dict,
        rng: jax.Array,
        prompt_token_lists: Sequence[Sequence[int]],
        analysis_token_lists: Sequence[Sequence[int]],
        molecule_properties: np.ndarray,
        *,
        gen: GenerationSettings = GenerationSettings(),
        rollback: bool = False,
        mesh=None,
        true_b: Optional[int] = None,
        design_hidden: Optional[jnp.ndarray] = None,
    ) -> List[Optional[str]]:
        """Post-decode Phase-1 stages: token surgery -> body re-forward
        -> connector -> GraphDiT -> (rollback). Shared by
        design_molecule and the continuous serving path
        (serve.ContinuousDesignServer decodes analyses through a slot
        pool, then batches this stage separately). design_hidden, when
        precomputed via the decode-cache query extension
        (_body_hidden_extend_jit), skips the full-sequence re-forward;
        rows must align with prompt/analysis order."""
        rng, k_diff = jax.random.split(rng)
        # host token surgery: prompt + analysis + <design_start> + K bodies
        ds = self.token_id_dict["<design_start>"]
        body = self.token_id_dict["<design_body>"]
        seqs = [list(p) + list(a) + [ds] + [body] * self.num_body_tokens
                for p, a in zip(prompt_token_lists, analysis_token_lists)]
        if design_hidden is None:
            design_ids, design_mask = self._left_pad(seqs)
            if mesh is not None:
                (design_ids, design_mask), _ = self._place_dp(
                    [design_ids, design_mask], mesh)
            else:
                design_ids = jnp.asarray(design_ids)
                design_mask = jnp.asarray(design_mask)

            design_hidden = self._body_hidden_jit(
                frozen, trainable, design_ids, design_mask)
        cond = jax.nn.silu(
            dense(trainable["connectors"]["lm_to_graph_decoder"], design_hidden))
        props = jnp.asarray(molecule_properties, jnp.float32)
        cond_f32 = cond.astype(jnp.float32)
        smiles = self.graph_decoder.generate(
            frozen["graph_decoder"], k_diff, props, cond_f32, mesh=mesh)
        true_b = len(seqs) if true_b is None else true_b
        # diffusion resampling: rows whose assembly failed redraw from
        # the sampler (full batch — identical shapes, so the already-
        # compiled executable; no new tunnel compiles) before falling
        # back to LLM rollback text. The reference rolls back
        # immediately (modeling_llamole.py:665-718); redrawing first
        # keeps failures inside the graph-decoder distribution.
        for _ in range(max(0, gen.design_resamples)):
            if all(s is not None for s in smiles[:true_b]):
                break
            rng, k_diff = jax.random.split(rng)
            redraw = self.graph_decoder.generate(
                frozen["graph_decoder"], k_diff, props, cond_f32, mesh=mesh)
            smiles = [a if a is not None else b
                      for a, b in zip(smiles, redraw)]
        smiles = smiles[:true_b]
        seqs = seqs[:true_b]

        if rollback and any(s is None for s in smiles):
            rng, k_rb = jax.random.split(rng)
            smiles = self.design_rollback(
                frozen, trainable, k_rb, seqs, smiles, gen)
        return smiles

    def design_rollback(
        self, frozen, trainable, rng, design_seqs: Sequence[Sequence[int]],
        smiles_list: List[Optional[str]], gen: GenerationSettings,
    ) -> List[Optional[str]]:
        """Ask the LLM for SMILES between rollback tags when the diffusion
        sample failed (parity: modeling_llamole.py:665-718)."""
        none_idx = [i for i, s in enumerate(smiles_list) if s is None]
        if not none_idx:
            return smiles_list
        rb = self.token_id_dict["<rollback_start>"]
        rb_end = self.token_id_dict["<rollback_end>"]
        seqs = [list(design_seqs[i]) + [rb] for i in none_idx]
        # pow2-bucket the row count (how many diffusion samples failed
        # varies run to run; an exact-count batch would compile a fresh
        # 8B decode per distinct failure count — the same shape-churn
        # class the A* value scoring had). Length is 64-banded by
        # _left_pad already.
        n = len(seqs)
        W = 1 << (n - 1).bit_length() if n > 1 else 1
        seqs = seqs + [seqs[-1]] * (W - n)
        ids, mask = self._left_pad(seqs)
        gen2 = dc_replace(gen, max_new_tokens=gen.max_new_tokens * 2)
        # stop on rollback_end or eos only — the SMILES itself is plain text
        toks, _ = self._generate_tokens(
            frozen, trainable, ids, mask, rng, gen2,
            (self.tokenizer.eos_token_id, rb_end))
        toks = toks[:n]
        from ..chem import canonical_smiles
        for row, i in zip(toks, none_idx):
            text = self.tokenizer.decode(self._strip_pads(row),
                                         skip_special_tokens=True).strip()
            if not text:
                smiles_list[i] = None
                continue
            # LLM free text joins the canonical space when it parses;
            # unparseable text passes through raw (reference parity —
            # modeling_llamole.py:709 takes the decoded string verbatim
            # and downstream validity checks classify it)
            canon = canonical_smiles(text)
            smiles_list[i] = canon if canon is not None else text
        return smiles_list

    # ------------------------------------------------------------------
    # generation: one-step retrosynthesis expansion
    # ------------------------------------------------------------------
    def one_step_reaction(
        self,
        frozen: Dict,
        trainable: Dict,
        rng: jax.Array,
        product_smiles: str,
        design_text: Optional[str] = None,
        prefix_ids: Optional[Sequence[int]] = None,
        topk: int = 50,
        gen: GenerationSettings = GenerationSettings(),
    ) -> Dict[str, Any]:
        """Expand one molecule: LLM analysis -> retro query hiddens ->
        predictor -> template application
        (parity: modeling_llamole.py:784-889)."""
        from ..chem.featurize import smiles_to_graph

        product_graph = smiles_to_graph(product_smiles)
        if product_graph is None:
            return {"reactants": [], "scores": [], "templates": [],
                    "analysis": self.tokenizer.encode("Invalid product SMILES")}

        mol_id = self.token_id_dict["<molecule>"]
        text = (f"{design_text} " if design_text else "") + \
            "To synthesize <molecule>, follow these procedures: "
        prompt = list(prefix_ids or []) + self.tokenizer.encode(text)
        ids, mask = self._left_pad([prompt])

        # splice the product embedding at the <molecule> slot
        # (graph size bucketed to 8 to bound recompiles)
        n = ((product_graph.n_nodes + 7) // 8) * 8
        k = product_graph.n_nodes
        atoms = np.zeros((1, n), np.int32); atoms[0, :k] = product_graph.atom_types
        edges = np.zeros((1, n, n), np.int32)
        edges[0, :k, :k] = product_graph.edge_classes
        gmask = np.zeros((1, n), bool); gmask[0, :k] = True
        positions = [i for i, t in enumerate(ids[0]) if t == mol_id]
        mol_rows = np.zeros(1, np.int32)
        mol_cols = np.asarray([positions[-1] if positions else 0], np.int32)
        mol_valid = np.asarray([bool(positions)], bool)
        embeds = self._splice_molecule_embeds(
            frozen, trainable, jnp.asarray(ids), jnp.asarray(atoms),
            jnp.asarray(edges), jnp.asarray(gmask), jnp.asarray(mol_valid),
            jnp.asarray(mol_rows), jnp.asarray(mol_cols))

        rng, k_gen = jax.random.split(rng)
        gen512 = dc_replace(gen, max_new_tokens=(
            max(gen.max_new_tokens, 512) if gen.max_new_tokens else 512))
        analysis, _ = self._generate_tokens(
            frozen, trainable, ids, mask, k_gen, gen512, self._eos_ids(),
            inputs_embeds=embeds)

        rs = self.token_id_dict["<retro_start>"]
        body = self.token_id_dict["<retro_body>"]
        a_tokens = self._strip_pads(analysis[0])
        retro_seq = a_tokens + [rs] + [body] * self.num_body_tokens
        retro_ids, retro_mask = self._left_pad([retro_seq])
        retro_hidden = self._body_hidden_jit(
            frozen, trainable, jnp.asarray(retro_ids), jnp.asarray(retro_mask))
        cond = jax.nn.silu(
            dense(trainable["connectors"]["lm_to_graph_predictor"], retro_hidden))

        reactants, scores, templates = self.graph_predictor.sample_templates(
            frozen["graph_predictor"], product_graph,
            cond.astype(jnp.float32), product_smiles, topk)

        final_analysis = self.tokenizer.encode(
            f"To synthesize {product_smiles}, follow these procedures: ") + a_tokens
        return {"reactants": reactants, "scores": scores,
                "templates": templates, "analysis": final_analysis}

    def batched_one_step_reaction(
        self,
        frozen: Dict,
        trainable: Dict,
        rng: jax.Array,
        product_smiles_list: Sequence[str],
        design_text: Optional[str] = None,
        prefix_ids: Optional[Sequence[int]] = None,
        topk: int = 50,
        gen: GenerationSettings = GenerationSettings(),
        analysis_tokens: Optional[int] = None,  # analysis decode budget
                                                # (None = reference's 512)
        pad_rows_to: Optional[int] = None,
        mesh=None,
    ) -> List[Dict[str, Any]]:
        """Frontier-batched expansion: one generate + one re-forward for W
        products (the reference expands one node per LLM call —
        modeling_llamole.py:784; batching is the SURVEY §7.7 divergence).
        Prompt lengths bucket to coarse multiples of 256, and the batch
        dimension buckets to the next power of two — or, with
        pad_rows_to, to that FIXED width (padding rows repeat the last
        product and are dropped from the result), so the decode program
        compiles once per (width-bucket, length-bucket). The planner
        passes pad_rows_to=total_width: decode is weight-HBM-bound at
        8B, so a padded 32-row batch costs the same wall as a 4-row one
        while a fresh pow2 bucket costs a ~60 s tunnel compile INSIDE
        the planning wall (measured: a 3-item late round took 60 s
        against round-1's 25 s for 24 items purely on the W=4 compile).
        """
        from ..chem.featurize import smiles_to_graph

        n_real = len(product_smiles_list)
        if n_real == 0:
            return []
        W = 1 << (n_real - 1).bit_length() if n_real > 1 else 1
        if pad_rows_to is not None and pad_rows_to >= n_real:
            W = pad_rows_to
        if mesh is not None:
            # dp-sharded expansion: the batch dim must divide over dp
            # (W stays a power of two for pow2 dp sizes, so the decode
            # program still compiles once per width bucket)
            import math
            dp = mesh.shape.get("dp", 1)
            W = W * dp // math.gcd(W, dp)
        product_smiles_list = (list(product_smiles_list)
                               + [product_smiles_list[-1]] * (W - n_real))
        # per-row conditioning (cross-target frontier batching mixes
        # targets with different design texts/prompt prefixes in one
        # batch); a scalar — including the EMPTY string/list — applies
        # to every row (an empty flat prefix must not be mistaken for a
        # zero-row per-row spec)
        if design_text is None or isinstance(design_text, str) \
                or len(design_text) == 0:
            scalar_text = design_text if isinstance(design_text, str) else None
            texts = [scalar_text] * W
        else:
            texts = list(design_text) + [design_text[-1]] * (W - n_real)
        if (prefix_ids is None or len(prefix_ids) == 0
                or not isinstance(prefix_ids[0], (list, tuple))):
            prefixes = [prefix_ids] * W
        else:
            prefixes = list(prefix_ids) + [prefix_ids[-1]] * (W - n_real)
        # featurize/tokenize only the REAL rows, then replicate the last
        # row's results into the padding — with pad_rows_to=total_width
        # a 2-item late round would otherwise re-run smiles_to_graph +
        # tokenizer.encode 30 extra times on this 1-core host, inside
        # the planning wall
        graphs = [smiles_to_graph(s) for s in product_smiles_list[:n_real]]
        mol_id = self.token_id_dict["<molecule>"]
        prompts = []
        for s, dt, pre in zip(product_smiles_list[:n_real], texts, prefixes):
            text = (f"{dt} " if dt else "") + \
                "To synthesize <molecule>, follow these procedures: "
            prompts.append(list(pre or []) + self.tokenizer.encode(text))
        graphs += [graphs[-1]] * (W - n_real)
        prompts += [prompts[-1]] * (W - n_real)

        # left-pad to a COARSE 256-multiple bucket: the prompt carries
        # per-target design text whose length varies run to run, and a
        # fresh band here costs a fresh 8B decode compile (~60 s over
        # the tunnel) INSIDE the planning wall. 256-bands mean nearly
        # every expansion lands in one or two programs that a warm-up
        # pass has already compiled; the extra prefill is one pass over
        # pad tokens (~ms).
        longest = max(len(p) for p in prompts)
        bucket = ((longest + 255) // 256) * 256
        pad = self.tokenizer.pad_token_id
        ids = np.full((W, bucket), pad, np.int32)
        mask = np.zeros((W, bucket), np.int32)
        for i, p in enumerate(prompts):
            ids[i, -len(p):] = p
            mask[i, -len(p):] = 1

        # graph bank: one product graph per row, N bucketed to 8
        max_n = max((g.n_nodes for g in graphs if g is not None), default=8)
        n_pad = ((max_n + 7) // 8) * 8
        atoms = np.zeros((W, n_pad), np.int32)
        edges = np.zeros((W, n_pad, n_pad), np.int32)
        gmask = np.zeros((W, n_pad), bool)
        rows = np.arange(W, dtype=np.int32)
        cols = np.zeros(W, np.int32)
        valid = np.zeros(W, bool)
        for i, g in enumerate(graphs):
            if g is None:
                continue
            k = g.n_nodes
            atoms[i, :k] = g.atom_types
            edges[i, :k, :k] = g.edge_classes
            gmask[i, :k] = True
            pos = [j for j, t in enumerate(ids[i]) if t == mol_id]
            if pos:
                cols[i] = pos[-1]
                valid[i] = True

        if mesh is not None:
            # shard every per-row tensor over dp; the jitted stages
            # below then run data-parallel under GSPMD (same pattern as
            # design_molecule's multi-chip sampling)
            (ids_d, mask_d, atoms, edges, gmask, valid, rows,
             cols), _ = self._place_dp(
                [ids, mask, atoms, edges, gmask, valid, rows, cols], mesh)
        else:
            ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)

        embeds = self._splice_molecule_embeds(
            frozen, trainable, jnp.asarray(ids_d), jnp.asarray(atoms),
            jnp.asarray(edges), jnp.asarray(gmask), jnp.asarray(valid),
            jnp.asarray(rows), jnp.asarray(cols))

        rng, k_gen = jax.random.split(rng)
        floor = analysis_tokens or 512
        gen512 = dc_replace(gen, max_new_tokens=(
            max(gen.max_new_tokens, floor) if gen.max_new_tokens else floor))
        analysis, _ = self._generate_tokens(
            frozen, trainable, ids_d, mask_d, k_gen, gen512, self._eos_ids(),
            inputs_embeds=embeds)

        rs = self.token_id_dict["<retro_start>"]
        body = self.token_id_dict["<retro_body>"]
        retro_seqs = []
        a_tokens_all = []
        for i in range(W):
            a_tokens = self._strip_pads(analysis[i])
            a_tokens_all.append(a_tokens)
            retro_seqs.append(a_tokens + [rs] + [body] * self.num_body_tokens)
        # coarse 256-bands for the re-forward too: analysis lengths vary
        # with early-exit decode, and each new band costs a
        # _body_hidden_jit compile inside the planning wall
        retro_ids, retro_mask = self._left_pad(retro_seqs, bucket=256)
        if mesh is not None:
            (retro_ids, retro_mask), _ = self._place_dp(
                [retro_ids, retro_mask], mesh)
        retro_hidden = self._body_hidden_jit(
            frozen, trainable, jnp.asarray(retro_ids), jnp.asarray(retro_mask))
        cond = jax.nn.silu(
            dense(trainable["connectors"]["lm_to_graph_predictor"], retro_hidden))
        cond = np.asarray(cond.astype(jnp.float32))

        results = []
        for i, (smi, g) in enumerate(
                zip(product_smiles_list[:n_real], graphs[:n_real])):
            if g is None:
                results.append({"reactants": [], "scores": [], "templates": [],
                                "analysis": self.tokenizer.encode(
                                    "Invalid product SMILES")})
                continue
            reactants, scores, templates = self.graph_predictor.sample_templates(
                frozen["graph_predictor"], g, jnp.asarray(cond[i]), smi, topk)
            final_analysis = self.tokenizer.encode(
                f"To synthesize {smi}, follow these procedures: ") + a_tokens_all[i]
            results.append({"reactants": reactants, "scores": scores,
                            "templates": templates, "analysis": final_analysis})
        return results

    # value-batch row cap: fresh-proposal counts vary wildly (up to
    # topk * width per iteration); one chunked, pow2-bucketed program
    # per (rows, length) pair instead of a fresh 8B compile per count
    _VALUE_CHUNK = 32

    def batched_estimate_complexity(
        self, frozen: Dict, smiles_list: Sequence[str],
        language_cost_weight: float = 1.0, chat_template=None,
        trainable: Optional[Dict] = None,
    ) -> List[float]:
        """Batched LLM likert cost scoring for the A* value function.

        Both dims bucket so the jitted forward compiles once per shape:
        prompt length to coarse 256-bands, row count padded to EXACTLY
        _VALUE_CHUNK (larger inputs chunk). Unbucketed rows measured
        catastrophic on the chip (molqa r4: every new fresh-molecule
        count recompiled an 8B forward over the tunnel — Phase-2 ran 5x
        past its planning budget on compiles alone). Fixed-size chunks
        rather than pow2 tails: a [32, L] forward costs ~ms while every
        extra compiled shape costs ~30 s over the tunnel, so ONE program
        per length band beats six near-free-compute variants."""
        from ..data.template import get_template
        template = chat_template or get_template("default")
        prompts = []
        for smiles in smiles_list:
            content = (f"Estimate remaining steps for the target {smiles} "
                       "considering intermediate complexity, reagent "
                       "availability, side reactions, stereochemistry.")
            prompts.append(self.tokenizer.encode(
                template.render_prompt([{"role": "user", "content": content}])))

        llm_params = self._value_llm_params(trainable, frozen)
        last_rows = []
        for start in range(0, len(prompts), self._VALUE_CHUNK):
            chunk = prompts[start:start + self._VALUE_CHUNK]
            n = len(chunk)
            chunk = chunk + [chunk[-1]] * (self._VALUE_CHUNK - n)
            # coarse 256-bands (same rationale as the expansion decode:
            # SMILES lengths vary per round; one program, not one per band)
            ids, mask = self._left_pad(chunk, bucket=256)
            logits = self._last_logits_jit(llm_params, jnp.asarray(ids),
                                           jnp.asarray(mask))
            last_rows.append(np.asarray(logits)[:n])
        last = np.concatenate(last_rows, axis=0)

        answers = [
            "All readily available",
            "Some commercial, some need 1-2 steps",
            "Mix of commercial and multi-step synthesis",
            "Mostly require complex synthesis",
            "All require extensive multi-step synthesis",
        ]
        answer_costs = np.asarray([0.0, 1.0, 2.5, 4.5, 7.0])
        answer_tok = [self.tokenizer.encode(a) for a in answers]
        out = []
        for row in last:
            a_logits = np.asarray([row[t].mean() for t in answer_tok])
            p = np.exp(a_logits - a_logits.max())
            p = p / p.sum()
            out.append(float((p * answer_costs).sum()) * language_cost_weight)
        return out

    def _value_llm_params(self, trainable: Optional[Dict], frozen: Dict):
        """LLM params for the likert value scoring — full finetuning
        keeps the LLM in `trainable` (frozen['llm'] is absent), LoRA
        scores with the base weights (reference value path uses the base
        model, modeling_llamole.py:891-939)."""
        llm = (trainable or {}).get("llm") or frozen.get("llm")
        if llm is None:
            raise ValueError("no LLM params for value scoring (neither "
                             "trainable['llm'] nor frozen['llm'] present)")
        return llm

    @functools.partial(jax.jit, static_argnums=(0,))
    def _last_logits_jit(self, llm_params, input_ids, attention_mask):
        logits, _, _ = llm_forward(
            llm_params.get("llm", llm_params), self.llm.cfg,
            input_ids=input_ids, attention_mask=attention_mask)
        return logits[:, -1, :]

    # ------------------------------------------------------------------
    # generation: synthesis-cost estimation (A* value function)
    # ------------------------------------------------------------------
    def estimate_synthesis_complexity(
        self,
        frozen: Dict,
        smiles: str,
        reaction=None,
        molecule_cost_weight: float = 0.0,
        language_cost_weight: float = 1.0,
        cost_mlp=None,
        cost_mlp_params=None,
        chat_template=None,
        trainable: Optional[Dict] = None,
    ) -> float:
        """CostMLP fingerprint cost + LLM 5-way likert scoring
        (parity: modeling_llamole.py:891-993)."""
        cost = 0.0
        if molecule_cost_weight > 0 and cost_mlp is not None:
            try:
                cost += cost_mlp.estimate_cost(cost_mlp_params, smiles) \
                    * molecule_cost_weight
            except ValueError:
                pass
        if language_cost_weight > 0:
            if reaction is None:
                content = (f"Estimate remaining steps for the target {smiles} "
                           "considering intermediate complexity, reagent "
                           "availability, side reactions, stereochemistry.")
            else:
                reactants = ", ".join(r.smiles for r in reaction.children)
                content = (f"Estimate remaining steps for the target {smiles} "
                           f"at step {reaction.depth + 1} with template "
                           f"{reaction.template} and reactants {reactants}.")
            from ..data.template import get_template
            template = chat_template or get_template("default")
            chat_text = template.render_prompt(
                [{"role": "user", "content": content}])
            # coarse 256-bands, same rationale as batched_estimate_complexity
            ids, mask = self._left_pad(
                [self.tokenizer.encode(chat_text)], bucket=256)
            last = self._last_logits_jit(
                self._value_llm_params(trainable, frozen),
                jnp.asarray(ids), jnp.asarray(mask))[0]

            answers = [
                "All readily available",
                "Some commercial, some need 1-2 steps",
                "Mix of commercial and multi-step synthesis",
                "Mostly require complex synthesis",
                "All require extensive multi-step synthesis",
            ]
            answer_costs = np.asarray([0.0, 1.0, 2.5, 4.5, 7.0])
            answer_logits = []
            for a in answers:
                toks = self.tokenizer.encode(a)
                answer_logits.append(float(jnp.mean(last[jnp.asarray(toks)])))
            p = np.exp(answer_logits - np.max(answer_logits))
            p = p / p.sum()
            cost += float((p * answer_costs).sum()) * language_cost_weight
        return cost

    # ------------------------------------------------------------------
    # generation: multi-step retrosynthesis via Retro* search
    # ------------------------------------------------------------------
    def retrosynthesize(
        self,
        frozen: Dict,
        trainable: Dict,
        rng: jax.Array,
        smiles: Optional[str],
        starting_mols=None,
        expansion_topk: int = 50,
        iterations: int = 100,
        molecule_cost_weight: float = 0.0,
        language_cost_weight: float = 1.0,
        max_planning_time: float = 300.0,
        rollback: bool = True,
        design_text: Optional[str] = None,
        prefix_ids: Optional[Sequence[int]] = None,
        gen: GenerationSettings = GenerationSettings(),
        frontier_width: int = 1,
        mesh=None,
    ) -> Dict[str, Any]:
        """Plan a route for one molecule (parity:
        modeling_llamole.py:995-1093). frontier_width > 1 batches the W
        best open nodes per search iteration through one LLM call."""
        import time as _time
        from ..planner import retro_star_search

        if starting_mols is None:
            starting_mols = self.graph_predictor.available
            if starting_mols is None:
                raise ValueError("No starting molecules available.")
            starting_mols = set(starting_mols)  # already canonical
        else:
            # user-supplied inventory: re-spell in our canonical space so
            # membership hits regardless of the writer's convention
            from ..chem import recanonicalize
            starting_mols = {recanonicalize(s) for s in starting_mols}

        if smiles is None:
            return self._failure_result(None)
        target = smiles.replace("*", "[H]") if "*" in smiles else smiles
        # the target is external input too: re-spell so in-stock
        # detection and ancestor-cycle checks share the inventory's
        # canonical space (idempotent for Phase-1 outputs)
        from ..chem import recanonicalize
        target = recanonicalize(target)
        if not self.graph_decoder.check_valid(target):
            if rollback:
                tokens = self._retro_rollback_tokens(
                    frozen, trainable, rng, design_text, target, gen)
                return self._failure_result(target, tokens)
            return self._failure_result(target)

        rngs = {"k": rng}

        def expand_fn(s):
            rngs["k"], sub = jax.random.split(rngs["k"])
            return self.one_step_reaction(
                frozen, trainable, sub, s, design_text=design_text,
                prefix_ids=prefix_ids, topk=expansion_topk, gen=gen)

        def value_fn(s, parent_reaction):
            return self.estimate_synthesis_complexity(
                frozen, s, parent_reaction,
                molecule_cost_weight, language_cost_weight,
                cost_mlp=self.cost_mlp,
                cost_mlp_params=self.cost_mlp_params,
                trainable=trainable)

        def batch_expand_fn(smiles_list):
            rngs["k"], sub = jax.random.split(rngs["k"])
            return self.batched_one_step_reaction(
                frozen, trainable, sub, smiles_list, design_text=design_text,
                prefix_ids=prefix_ids, topk=expansion_topk, gen=gen,
                pad_rows_to=frontier_width, mesh=mesh)

        def batch_value_fn(smiles_list):
            if language_cost_weight > 0:
                vals = self.batched_estimate_complexity(
                    frozen, smiles_list, language_cost_weight,
                    trainable=trainable)
            else:
                vals = [0.0] * len(smiles_list)
            if molecule_cost_weight > 0 and self.cost_mlp is not None:
                mol_costs = self.cost_mlp.estimate_costs(
                    self.cost_mlp_params, smiles_list)
                vals = [v + molecule_cost_weight * c
                        for v, c in zip(vals, mol_costs)]
            return vals

        t0 = _time.time()
        success, route, iters = retro_star_search(
            target, starting_mols, expand_fn, value_fn,
            iterations=iterations, max_time=max_planning_time,
            expansion_width=frontier_width,
            batch_expand_fn=batch_expand_fn if frontier_width > 1 else None,
            batch_value_fn=(batch_value_fn
                            if (language_cost_weight > 0
                                or (molecule_cost_weight > 0
                                    and self.cost_mlp is not None))
                            else None))
        total_time = _time.time() - t0

        if success:
            reactions, templates, costs, analyses = route.get_reaction_list()
            return {
                "target": target, "success": True, "time": total_time,
                "reaction_list": reactions, "cost": costs,
                "templates": templates, "analysis_tokens": analyses,
                "route_length": route.length, "expansions": iters,
            }
        if rollback:
            tokens = self._retro_rollback_tokens(
                frozen, trainable, rng, design_text, target, gen)
            return self._failure_result(target, tokens, expansions=iters)
        return self._failure_result(target, expansions=iters)

    def retrosynthesize_batch(
        self,
        frozen: Dict,
        trainable: Dict,
        rng: jax.Array,
        smiles_list: Sequence[Optional[str]],
        *,
        starting_mols=None,
        expansion_topk: int = 50,
        iterations: int = 100,
        molecule_cost_weight: float = 0.0,
        language_cost_weight: float = 1.0,
        max_planning_time: float = 300.0,
        rollback: bool = True,
        design_text_map: Optional[Dict[str, str]] = None,
        prefix_ids_map: Optional[Dict[str, Sequence[int]]] = None,
        gen: GenerationSettings = GenerationSettings(),
        total_width: int = 8,
        share_planning_wall: bool = True,
        min_expansions_per_mol: int = 0,
        overtime_factor: float = 2.0,
        mesh=None,
    ) -> Dict[Optional[str], Dict[str, Any]]:
        """Plan routes for MANY molecules with one interleaved search.

        The reference (and retrosynthesize above) runs one full Retro*
        search per molecule sequentially; here every iteration gathers
        up to total_width open nodes across ALL targets' trees into one
        frontier batch (planner.retro_star_search_multi), so Phase-2
        eval keeps the chip busy across molecules, not just within one
        search. Value estimates share one cache across trees.

        max_planning_time is the per-molecule wall-clock budget
        (reference eval/workflow.py:172-173 semantics). The reference
        spends it sequentially — each molecule gets a dedicated
        30 s wall; with share_planning_wall (default) every tree runs
        CONCURRENTLY under one shared wall of the same length, so the
        whole batch finishes in max_planning_time rather than
        n * max_planning_time. Each molecule still receives its full
        per-molecule wall (all trees are active from t=0), but its
        share of ENGINE time within it shrinks with the batch — at
        real-weight engine rates (early-exit analyses, ~2 s/round) a
        tree still fits an order of magnitude more expansions than the
        reference's dedicated wall delivers at its ~20.5 s/expansion
        rate, while at random weights it lands slightly below (the
        per-result "expansions" count makes this checkable per run).
        The per-molecule `iterations` cap is unchanged and binds first
        when expansions are cheap. share_planning_wall=False restores
        the reference's engine-budget protocol exactly (wall scales by
        unique-target count) for apples-to-apples quality evals.
        min_expansions_per_mol > 0 adds an effort floor to the shared
        wall: trees below it keep running in overtime (lagging trees
        only), bounded by overtime_factor * max_planning_time — so
        delivered per-molecule effort cannot fall below the floor just
        because the batch was large, while the total wall stays within
        a small constant of the throughput budget.
        Returns {target: result} with the same result schema as
        retrosynthesize; each result's "time" is the shared batch
        wall-clock and "expansions" the tree's iterations used.
        design_text_map/prefix_ids_map attach per-target conditioning
        (keyed by the caller's spelling or the canonical one — both are
        remapped internally).
        """
        import time as _time
        from ..chem import recanonicalize
        from ..planner import retro_star_search_multi

        if starting_mols is None:
            starting_mols = self.graph_predictor.available
            if starting_mols is None:
                raise ValueError("No starting molecules available.")
            starting_mols = set(starting_mols)  # already canonical
        else:
            starting_mols = {recanonicalize(s) for s in starting_mols}

        design_text_map = design_text_map or {}
        prefix_ids_map = prefix_ids_map or {}

        # results are keyed by the CALLER's spelling (generate() looks
        # plans up by its smiles_list entries); the search itself runs
        # on canonical targets, deduped across equivalent spellings
        out: Dict[Optional[str], Dict[str, Any]] = {}
        key_of: Dict[str, str] = {}      # input smi -> canonical target
        targets: List[str] = []
        failed_canon: Dict[str, Dict[str, Any]] = {}
        for smi in smiles_list:
            if smi is None:
                out[None] = self._failure_result(None)
                continue
            if smi in key_of:
                continue
            t = smi.replace("*", "[H]") if "*" in smi else smi
            t = recanonicalize(t)
            key_of[smi] = t
            if t in targets or t in failed_canon:
                continue
            if not self.graph_decoder.check_valid(t):
                if rollback:
                    rng, sub = jax.random.split(rng)
                    tokens = self._retro_rollback_tokens(
                        frozen, trainable, sub,
                        design_text_map.get(smi), t, gen)
                    failed_canon[t] = self._failure_result(t, tokens)
                else:
                    failed_canon[t] = self._failure_result(t)
                continue
            targets.append(t)

        # caller maps may be keyed by input spellings — remap to canonical
        design_text_map = {key_of.get(k, k): v
                           for k, v in design_text_map.items()}
        prefix_ids_map = {key_of.get(k, k): v
                          for k, v in prefix_ids_map.items()}

        if not targets:
            for smi, t in key_of.items():
                out[smi] = failed_canon[t]
            return out

        rngs = {"k": rng}

        def batch_expand_fn(items):
            # items: [(target, product_smiles)] — per-row design text /
            # prompt prefix follow the owning target
            rngs["k"], sub = jax.random.split(rngs["k"])
            products = [s for _, s in items]
            texts = [design_text_map.get(t) for t, _ in items]
            prefixes = [list(prefix_ids_map.get(t) or []) for t, _ in items]
            return self.batched_one_step_reaction(
                frozen, trainable, sub, products,
                design_text=texts, prefix_ids=prefixes,
                topk=expansion_topk, gen=gen,
                pad_rows_to=total_width, mesh=mesh)

        def value_fn(s, parent_reaction):
            return self.estimate_synthesis_complexity(
                frozen, s, parent_reaction,
                molecule_cost_weight, language_cost_weight,
                cost_mlp=self.cost_mlp,
                cost_mlp_params=self.cost_mlp_params,
                trainable=trainable)

        def batch_value_fn(smiles_batch):
            if language_cost_weight > 0:
                vals = self.batched_estimate_complexity(
                    frozen, smiles_batch, language_cost_weight,
                    trainable=trainable)
            else:
                vals = [0.0] * len(smiles_batch)
            if molecule_cost_weight > 0 and self.cost_mlp is not None:
                mol_costs = self.cost_mlp.estimate_costs(
                    self.cost_mlp_params, smiles_batch)
                vals = [v + molecule_cost_weight * c
                        for v, c in zip(vals, mol_costs)]
            return vals

        t0 = _time.time()
        wall = (max_planning_time if share_planning_wall
                else max_planning_time * len(targets))
        results = retro_star_search_multi(
            targets, starting_mols, batch_expand_fn, value_fn,
            iterations=iterations,
            max_time=wall,
            total_width=total_width,
            min_iters_per_target=(min_expansions_per_mol
                                  if share_planning_wall else 0),
            max_time_hard=wall * max(overtime_factor, 1.0),
            batch_value_fn=(batch_value_fn
                            if (language_cost_weight > 0
                                or (molecule_cost_weight > 0
                                    and self.cost_mlp is not None))
                            else None))
        total_time = _time.time() - t0

        canon_results: Dict[str, Dict[str, Any]] = dict(failed_canon)
        for t in targets:
            success, route, iters = results[t]
            if success:
                reactions, templates, costs, analyses = \
                    route.get_reaction_list()
                canon_results[t] = {
                    "target": t, "success": True, "time": total_time,
                    "reaction_list": reactions, "cost": costs,
                    "templates": templates, "analysis_tokens": analyses,
                    "route_length": route.length, "expansions": iters,
                }
            elif rollback:
                rngs["k"], sub = jax.random.split(rngs["k"])
                tokens = self._retro_rollback_tokens(
                    frozen, trainable, sub, design_text_map.get(t), t, gen)
                canon_results[t] = self._failure_result(t, tokens,
                                                        expansions=iters)
            else:
                canon_results[t] = self._failure_result(t, expansions=iters)
        for smi, t in key_of.items():
            out[smi] = canon_results[t]
        return out

    def _retro_rollback_tokens(self, frozen, trainable, rng, design_text,
                               smiles, gen: GenerationSettings):
        """Free-text procedure generation when planning fails
        (parity: modeling_llamole.py:762-782)."""
        text = (f"{design_text} " if design_text else "") + \
            f"To synthesize {smiles}, follow these procedures: "
        ids, mask = self._left_pad([self.tokenizer.encode(text)])
        gen256 = dc_replace(gen, max_new_tokens=256)
        toks, _ = self._generate_tokens(frozen, trainable, ids, mask, rng,
                                        gen256, self._eos_ids())
        return self.tokenizer.encode(
            f"To synthesize {smiles}, follow these procedures: ") + \
            self._strip_pads(toks[0])

    @staticmethod
    def _failure_result(target, tokens=None, expansions=0) -> Dict[str, Any]:
        return {
            "target": target, "success": False, "time": 0.0,
            "reaction_list": None, "cost": None, "templates": None,
            "analysis_tokens": tokens if tokens is not None else "<NO ANALYSIS>",
            "route_length": None, "expansions": expansions,
        }

    # ------------------------------------------------------------------
    # generation: full orchestration (parity: modeling_llamole.py:1115-1287)
    # ------------------------------------------------------------------
    def generate(
        self,
        frozen: Dict,
        trainable: Dict,
        rng: jax.Array,
        input_ids: np.ndarray,
        attention_mask: Optional[np.ndarray] = None,
        molecule_properties: Optional[np.ndarray] = None,
        rollback: bool = False,
        starting_mols=None,
        expansion_topk: int = 50,
        iterations: int = 100,
        molecule_cost_weight: float = 0.0,
        language_cost_weight: float = 1.0,
        do_molecular_design: bool = True,
        do_retrosynthesis: bool = True,
        input_smiles_list: Optional[List[Optional[str]]] = None,
        max_planning_time: float = 30.0,
        design_text_list: Optional[List[str]] = None,
        gen: GenerationSettings = GenerationSettings(),
        frontier_width: int = 1,
        share_planning_wall: bool = True,
        min_expansions_per_mol: int = 0,
        mesh=None,
    ) -> Dict[str, Any]:
        input_ids = np.asarray(input_ids)
        if attention_mask is None:
            attention_mask = np.ones_like(input_ids)
        info: Dict[str, Any] = {
            "token_lists": [], "text_lists": [],
            "design_analysis_tokens": None, "smiles_list": None,
            "retro_plan_dict": None, "IGNORE_INDEX": IGNORE_INDEX,
        }

        rng, k_design = jax.random.split(rng)
        if do_molecular_design:
            analysis, smiles_list = self.design_molecule(
                frozen, trainable, k_design, input_ids, attention_mask,
                molecule_properties, gen=gen, rollback=rollback, mesh=mesh)
            info["design_analysis_tokens"] = analysis
            info["smiles_list"] = smiles_list
        elif input_smiles_list is not None:
            # externally-supplied targets: re-spell in our canonical
            # space (idempotent for Phase-1 outputs) so planner
            # membership and the '(available)' annotation stay exact
            from ..chem import recanonicalize
            info["smiles_list"] = [
                recanonicalize(s) if s is not None else None
                for s in input_smiles_list]
        else:
            raise ValueError("Need do_molecular_design or input_smiles_list.")

        if do_retrosynthesis:
            uniq = list(dict.fromkeys(info["smiles_list"]))
            if frontier_width > 1 and sum(s is not None for s in uniq) > 1:
                # cross-target interleaved search: one frontier batch
                # spans ALL molecules' trees (retrosynthesize_batch)
                design_map: Dict[str, str] = {}
                prefix_map: Dict[str, Any] = {}
                for i, smi in enumerate(info["smiles_list"]):
                    if smi is None or smi in design_map:
                        continue
                    if design_text_list:
                        design_map[smi] = design_text_list[
                            min(i, len(design_text_list) - 1)]
                    prefix_map[smi] = self._strip_pads(
                        input_ids[min(i, len(input_ids) - 1)])
                rng, k_retro = jax.random.split(rng)
                info["retro_plan_dict"] = self.retrosynthesize_batch(
                    frozen, trainable, k_retro, info["smiles_list"],
                    starting_mols=starting_mols,
                    expansion_topk=expansion_topk, iterations=iterations,
                    molecule_cost_weight=molecule_cost_weight,
                    language_cost_weight=language_cost_weight,
                    max_planning_time=max_planning_time, rollback=rollback,
                    design_text_map=design_map, prefix_ids_map=prefix_map,
                    gen=gen, total_width=frontier_width,
                    share_planning_wall=share_planning_wall,
                    min_expansions_per_mol=min_expansions_per_mol,
                    mesh=mesh)
            else:
                info["retro_plan_dict"] = {}
                for i, smi in enumerate(info["smiles_list"]):
                    if smi in info["retro_plan_dict"]:
                        continue  # duplicate design: reuse the plan
                    rng, k_retro = jax.random.split(rng)
                    # per-row text (the reference always takes index 0 —
                    # modeling_llamole.py:1175 — which mismatches text to
                    # molecule for every batch row past the first;
                    # indexing by row is the intended behavior)
                    design_text = (
                        design_text_list[min(i, len(design_text_list) - 1)]
                        if design_text_list else None)
                    info["retro_plan_dict"][smi] = self.retrosynthesize(
                        frozen, trainable, k_retro, smi,
                        starting_mols=starting_mols,
                        expansion_topk=expansion_topk, iterations=iterations,
                        molecule_cost_weight=molecule_cost_weight,
                        language_cost_weight=language_cost_weight,
                        max_planning_time=max_planning_time, rollback=rollback,
                        design_text=design_text,
                        prefix_ids=self._strip_pads(input_ids[min(i, len(input_ids) - 1)]),
                        gen=gen, frontier_width=frontier_width, mesh=mesh)
        else:
            info["retro_plan_dict"] = {
                s: {"success": None} for s in info["smiles_list"]}

        available = set(self.graph_predictor.available or [])
        for b, mol in enumerate(info["smiles_list"]):
            token_list: List[int] = []
            text_list: List[str] = []
            if do_molecular_design:
                design_tokens = self._strip_pads(
                    np.asarray(info["design_analysis_tokens"])[b])
                token_list = design_tokens + [IGNORE_INDEX]
                shown = mol if mol is not None else "<NO MOLECULE>"
                text_list = [
                    self.tokenizer.decode(design_tokens, skip_special_tokens=True),
                    shown + ". ",
                ]
            if do_retrosynthesis:
                plan = info["retro_plan_dict"][mol]
                if plan.get("success"):
                    for reaction, template, cost, analysis in zip(
                            plan["reaction_list"], plan["templates"],
                            plan["cost"], plan["analysis_tokens"]):
                        a = list(analysis) if isinstance(analysis, (list, tuple)) else []
                        token_list.extend(a + [IGNORE_INDEX])
                        text_list.extend([
                            self.tokenizer.decode(a, skip_special_tokens=True),
                            reaction if reaction else "<NO REACTION>",
                            " with the template ",
                            template if template else "<NO TEMPLATE>",
                            " which requires the reactants: ",
                        ])
                        if reaction:
                            reactants = reaction.split(">>")[1].split(".")
                            fmt = [r + " (available)" if r in available else r
                                   for r in reactants]
                            text_list.extend([", ".join(fmt), ". "])
                        else:
                            text_list.append("<NO REACTANTS>. ")
                else:
                    a = plan.get("analysis_tokens")
                    a = list(a) if isinstance(a, (list, tuple)) else []
                    token_list.extend(a)
                    text_list.extend([
                        self.tokenizer.decode(a, skip_special_tokens=True),
                        " <NO REACTION FOUND>",
                    ])
            info["token_lists"].append(token_list)
            info["text_lists"].append(text_list)
        return info

    # ------------------------------------------------------------------
    # persistence (parity: modeling_llamole.py:439-519 save_pretrained)
    # ------------------------------------------------------------------
    def save_pretrained(self, trainable: Dict, save_directory: str,
                        frozen: Optional[Dict] = None,
                        save_graph_modules: bool = False) -> None:
        from ..utils.serialization import save_pytree
        os.makedirs(save_directory, exist_ok=True)
        if "lora" in trainable:
            adapter = trainable["lora"]
            if getattr(self, "_pissa_init_adapter", None) is not None:
                # PiSSA trains against an in-memory residual base; export
                # as a standard rank-2r adapter over the ORIGINAL weights
                # so reloads with adapter_name_or_path are correct
                from .gllm.lora import pissa_to_lora
                adapter = pissa_to_lora(adapter, self._pissa_init_adapter)
            save_pytree(adapter,
                        os.path.join(save_directory, "adapter.msgpack"))
        if "llm" in trainable:  # full finetuning: export the whole LLM
            save_pytree(trainable["llm"],
                        os.path.join(save_directory, "llm.msgpack"))
        conn_dir = os.path.join(save_directory, "connector")
        os.makedirs(conn_dir, exist_ok=True)
        for name, p in trainable["connectors"].items():
            save_pytree(p, os.path.join(conn_dir, f"{name}.msgpack"))
        if save_graph_modules and frozen is not None:
            self.graph_decoder.save_pretrained(
                frozen["graph_decoder"], os.path.join(save_directory, "graph_decoder"))
            self.graph_predictor.save_pretrained(
                frozen["graph_predictor"], os.path.join(save_directory, "graph_predictor"))
            self.graph_encoder.save_pretrained(
                frozen["graph_encoder"], os.path.join(save_directory, "graph_encoder"))
        config = {
            "token_id_dict": self.token_id_dict,
            "num_body_tokens": self.num_body_tokens,
            "loss_weight_lm": self.loss_weight_lm,
            "loss_weight_design": self.loss_weight_design,
            "loss_weight_retro": self.loss_weight_retro,
            "lora_rank": self.lora_rank,
        }
        with open(os.path.join(save_directory, "graphllm_config.json"), "w") as f:
            json.dump(config, f, indent=2)

    def load_trainable(self, save_directory: str) -> Dict:
        from ..utils.serialization import load_pytree
        conn_dir = os.path.join(save_directory, "connector")
        connectors = {}
        for name in ("graph_to_lm", "lm_to_graph_decoder", "lm_to_graph_predictor"):
            connectors[name] = load_pytree(os.path.join(conn_dir, f"{name}.msgpack"))
        bundle = {"connectors": connectors}
        adapter = os.path.join(save_directory, "adapter.msgpack")
        if os.path.exists(adapter):
            bundle["lora"] = load_pytree(adapter)
        full_llm = os.path.join(save_directory, "llm.msgpack")
        if os.path.exists(full_llm):
            bundle["llm"] = load_pytree(full_llm)
        # msgpack restores numpy leaves; eager paths index params
        # numpy-first (llm.embed: weight[ids]), where a numpy base array
        # silently yields numpy outputs that lack .at — materialize as
        # jax arrays once at load
        return jax.tree.map(jnp.asarray, bundle)
