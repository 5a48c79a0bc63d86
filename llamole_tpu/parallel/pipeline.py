"""Pipeline parallelism (GPipe schedule) for the decoder stack.

The reference has no first-party pipeline parallelism (SURVEY.md §2.2:
TP/PP/SP/EP all absent — DP/ZeRO ride HF Trainer). This module is the
TPU-native PP axis of our mesh: the stacked [L, ...] layer parameters
(gllm/stacked.py) shard their leading depth axis over a 'pp' mesh axis,
and a shard_map runs the classic GPipe microbatch schedule:

  tick t:  stage s processes microbatch (t - s), then ppermutes its
           activation to stage s+1.  M microbatches, S stages ->
           M + S - 1 ticks, bubble fraction (S-1)/(M+S-1).

Everything is differentiable (ppermute's transpose is the inverse
permutation; the tick loop is a lax.scan), so one jax.grad over the
surrounding loss gives pipelined backward with the same schedule in
reverse. Composes with a dp axis (microbatch rows shard over dp);
tensor parallelism inside a stage is not combined here — use tp XOR pp
for the layer stack (both shard the same weight HBM).

Conventions: stages = mesh.shape['pp']; cfg.num_layers % stages == 0;
batch % num_microbatches == 0. Embedding / final norm / lm_head run
outside under plain GSPMD (they are O(vocab) work, pipelining them
would only deepen the bubble).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..models.gllm.config import LLMConfig
from ..models.gllm.model import decoder_layer, rope_frequencies
from ..utils.logging import get_logger

logger = get_logger(__name__)


def pipeline_param_pspecs(params: Dict[str, Any], axis: str = "pp",
                          strict: bool = True) -> Dict[str, Any]:
    """PartitionSpecs for a stacked-layout param tree: layer stacks shard
    depth over `axis`; everything else replicates. With strict=False the
    tree may contain no stacked leaves (e.g. a trainable bundle whose
    LoRA subtree is stacked but whose connectors are plain) — then only
    the stacked leaves shard."""
    if strict and "layers_stacked" not in params:
        raise ValueError("pipeline parallelism needs the stacked layout "
                         "(gllm/stacked.py stack_layers / cfg.scan_layers)")

    def spec_for(path, leaf):
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        if "layers_stacked" in keys:
            return P(axis, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _stage_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """[mb, S] key-validity -> [mb, S, S] causal ∧ key-real mask."""
    s = attention_mask.shape[-1]
    causal = jnp.tril(jnp.ones((s, s), bool))
    return causal[None, :, :] & (attention_mask[:, None, :] > 0)


def pipeline_decoder_forward(
    params: Dict[str, Any],          # stacked layout; leading L over 'pp'
    x: jnp.ndarray,                  # [B, S, H] embeddings
    attention_mask: jnp.ndarray,     # [B, S]
    positions: jnp.ndarray,          # [B, S]
    cfg: LLMConfig,
    mesh: Mesh,
    *,
    num_microbatches: int,
    axis: str = "pp",
    dp_axis: Optional[str] = "dp",
    lora: Optional[Dict] = None,
    lora_scale: float = 1.0,
    train: bool = False,
) -> jnp.ndarray:
    """Run the layer stack through the GPipe schedule; returns [B, S, H]
    (pre-final-norm hidden states)."""
    if cfg.num_experts > 0 and train:
        # inference (train=False) is fine: the aux loss only matters
        # for router gradients
        raise ValueError(
            "pipelined TRAINING drops the MoE router aux loss — "
            "experts would collapse silently; use the ep axis for MoE "
            "models (mesh='ep:N,dp:M')")
    if cfg.sliding_window is not None:
        # the pipeline stage runner builds one global causal mask for
        # every layer; gemma2-style alternating local attention would
        # silently widen the even layers' windows
        raise ValueError(
            "pipeline parallelism does not support sliding-window "
            "configs (gemma2) — shard with dp/tp instead")
    stages = mesh.shape[axis]
    stacked = params["layers_stacked"]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    if depth % stages != 0:
        raise ValueError(
            f"pp={stages} stages must evenly divide num_layers={depth}")
    b, s, h = x.shape
    M = num_microbatches
    if b % M != 0:
        raise ValueError(
            f"num_microbatches={M} must evenly divide batch={b}")
    mb = b // M
    inv_freq = rope_frequencies(cfg)
    if lora and "layers_stacked" not in lora:
        # match the stacked param layout (same silent-ignore hazard as
        # gllm.model.forward — see test_mismatched_lora_layout_converts)
        from ..models.gllm.stacked import stack_layers
        lora = stack_layers(lora)
    lora_stacked = (lora or {}).get("layers_stacked")

    x_mb = x.reshape(M, mb, s, h)
    mask_mb = attention_mask.reshape(M, mb, s)
    pos_mb = positions.reshape(M, mb, s)

    dpx = dp_axis if (dp_axis and dp_axis in mesh.shape
                      and mesh.shape[dp_axis] > 1
                      and mb % mesh.shape[dp_axis] == 0) else None
    if dpx is None and dp_axis and dp_axis in mesh.shape \
            and mesh.shape[dp_axis] > 1:
        # every dp rank redundantly computes the full microbatch — a
        # silent perf cliff, unlike the explicit pp/microbatch errors
        logger.warning(
            "pipeline: microbatch rows %d not divisible by %s=%d — "
            "data parallelism DISABLED, all dp ranks replicate the full "
            "microbatch (pick batch/num_microbatches divisible by dp)",
            mb, dp_axis, mesh.shape[dp_axis])
    data_spec = P(None, dpx, None)

    def body(layers_local, ll_local, x_mb, mask_mb, pos_mb):
        stage = jax.lax.axis_index(axis)
        mb_l = x_mb.shape[1]   # local microbatch rows (mb / dp shards)

        def run_stage(xa, mask_row, pos_row):
            mask_bss = _stage_mask(mask_row)

            def one_layer(xc, xs):
                layer = xs[0] if isinstance(xs, tuple) else xs
                ll = xs[1] if isinstance(xs, tuple) else None

                def f(xc, layer, ll):
                    out, _, _aux = decoder_layer(
                        layer, ll, xc, cfg=cfg, positions=pos_row,
                        inv_freq=inv_freq, attention_mask=mask_row,
                        mask=mask_bss, lora_scale=lora_scale, train=train)
                    # MoE aux is not plumbed through the pipeline; use
                    # the ep axis (not pp) for MoE models
                    return out

                if cfg.remat:
                    f = jax.checkpoint(f)
                return f(xc, layer, ll or {}), None

            xs = (layers_local if ll_local is None
                  else (layers_local, ll_local))
            xa, _ = jax.lax.scan(one_layer, xa, xs)
            return xa

        # every value entering the tick loop must be device-varying over
        # pp AND any data axes the inputs shard over (shard_map VMA; see
        # ring_attention.py) or the scan carry types mismatch
        vary = (axis,) + ((dpx,) if dpx else ())

        def pvary_missing(v):
            missing = tuple(a for a in vary
                            if a not in jax.typeof(v).vma)
            if not missing:
                return v
            pcast = getattr(jax.lax, "pcast", None)  # pvary deprecated
            if pcast is not None:
                return pcast(v, missing, to="varying")
            return jax.lax.pvary(v, missing)

        x_mb_v = pvary_missing(x_mb)
        mask_v = pvary_missing(mask_mb)
        pos_v = pvary_missing(pos_mb)
        act0 = pvary_missing(jnp.zeros((mb_l, s, h), x_mb.dtype))
        outs0 = pvary_missing(jnp.zeros_like(x_mb))
        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def tick(carry, t):
            act, outs = carry
            m = t - stage                 # this stage's microbatch id
            m_c = jnp.clip(m, 0, M - 1)
            x_in = jax.lax.dynamic_index_in_dim(x_mb_v, m_c, 0,
                                                keepdims=False)
            inp = jnp.where(stage == 0, x_in, act)
            mask_row = jax.lax.dynamic_index_in_dim(mask_v, m_c, 0,
                                                    keepdims=False)
            pos_row = jax.lax.dynamic_index_in_dim(pos_v, m_c, 0,
                                                   keepdims=False)
            out = run_stage(inp, mask_row, pos_row)
            # last stage archives finished microbatches (bubble ticks
            # where m is out of range overwrite slot m_c with its old
            # value — a no-op)
            old = jax.lax.dynamic_index_in_dim(outs, m_c, 0, keepdims=False)
            valid = (stage == stages - 1) & (m >= 0) & (m < M)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, out, old), m_c, 0)
            act_next = jax.lax.ppermute(out, axis, perm)
            return (act_next, outs), None

        (act, outs), _ = jax.lax.scan(
            tick, (act0, outs0), jnp.arange(M + stages - 1))
        # replicate the last stage's archive across pp ranks
        outs = jax.lax.psum(
            jnp.where(stage == stages - 1, outs,
                      jnp.zeros_like(outs)), axis)
        return outs

    layer_spec = jax.tree.map(
        lambda l: P(axis, *([None] * (l.ndim - 1))), stacked)
    if lora_stacked is None:
        fn = jax.shard_map(
            lambda lp, xm, mm, pm: body(lp, None, xm, mm, pm), mesh=mesh,
            in_specs=(layer_spec, data_spec, data_spec, data_spec),
            out_specs=data_spec)
        outs = fn(stacked, x_mb, mask_mb, pos_mb)
    else:
        ll_spec = jax.tree.map(
            lambda l: P(axis, *([None] * (l.ndim - 1))), lora_stacked)
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(layer_spec, ll_spec, data_spec, data_spec, data_spec),
            out_specs=data_spec)
        outs = fn(stacked, lora_stacked, x_mb, mask_mb, pos_mb)
    return outs.reshape(b, s, h)


def pipeline_lm_loss(
    params: Dict[str, Any],
    cfg: LLMConfig,
    mesh: Mesh,
    input_ids: jnp.ndarray,       # [B, S]
    attention_mask: jnp.ndarray,  # [B, S]
    labels: jnp.ndarray,          # [B, S]
    *,
    num_microbatches: int,
    axis: str = "pp",
    lora: Optional[Dict] = None,
    lora_scale: float = 1.0,
    train: bool = True,
) -> jnp.ndarray:
    """Causal-LM loss with the layer stack pipelined over `axis`.
    Embedding/head run under plain GSPMD around the shard_map."""
    from ..models.gllm.model import finalize_hidden, lm_loss

    positions = jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, 0, None)
    x = params["embed"]["weight"][input_ids]
    if cfg.scale_embeddings:   # gemma: ×sqrt(hidden)
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    hidden = pipeline_decoder_forward(
        params, x, attention_mask, positions, cfg, mesh,
        num_microbatches=num_microbatches, axis=axis, lora=lora,
        lora_scale=lora_scale, train=train)
    logits, _ = finalize_hidden(params, cfg, hidden)
    return lm_loss(logits, labels)
