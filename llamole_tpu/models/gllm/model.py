"""Decoder-only LLM (llama/qwen2/mistral families), functional JAX.

TPU-first counterpart of the reference's HF AutoModelForCausalLM usage
(src/model/loader.py:148-220). One implementation covers all three base
models (RMSNorm + RoPE + GQA + SwiGLU; family differences are config
flags). Forward supports:

  - input_ids OR pre-built inputs_embeds (the multimodal splice path,
    modeling_llamole.py:325-341 embeds molecule vectors at <molecule>
    positions before the LM call)
  - optional LoRA overlay applied at every projection (lora.py)
  - KV-cache prefill + single-token decode for generation

Generation runs as one jitted program: prefill then lax.scan over decode
steps with temperature/top-p sampling and a stop-token done mask.
bf16 matmuls, f32 norms/softmax/logits.
"""

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import LLMConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _linear_init(key, in_dim, out_dim, bias, dtype):
    std = in_dim ** -0.5
    p = {"w": (jax.random.normal(key, (in_dim, out_dim), jnp.float32) * std).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def init_params(key: jax.Array, cfg: LLMConfig, dtype=jnp.bfloat16) -> Params:
    hd = cfg.head_dim_
    keys = jax.random.split(key, cfg.num_layers + 3)
    # gemma zero-centered norm weights init at 0 (≡ unit scale)
    norm_one = (jnp.zeros((cfg.hidden_size,), dtype)
                if cfg.rms_norm_unit_offset
                else jnp.ones((cfg.hidden_size,), dtype))
    params: Params = {
        "embed": {"weight": (jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.hidden_size), jnp.float32) * 0.02
        ).astype(dtype)},
        "layers": [],
        "final_norm": {"scale": norm_one},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _linear_init(
            keys[1], cfg.hidden_size, cfg.vocab_size, False, dtype)
    for i in range(cfg.num_layers):
        ks = jax.random.split(keys[3 + i], 7)
        params["layers"].append({
            "input_norm": {"scale": norm_one},
            "attn": {
                "q": _linear_init(ks[0], cfg.hidden_size, cfg.num_heads * hd,
                                  cfg.attention_bias, dtype),
                "k": _linear_init(ks[1], cfg.hidden_size, cfg.num_kv_heads * hd,
                                  cfg.attention_bias, dtype),
                "v": _linear_init(ks[2], cfg.hidden_size, cfg.num_kv_heads * hd,
                                  cfg.attention_bias, dtype),
                "o": _linear_init(ks[3], cfg.num_heads * hd, cfg.hidden_size,
                                  False, dtype),
            },
            "post_norm": {"scale": norm_one},
            **({"post_attn_norm": {"scale": norm_one},
                "post_mlp_norm": {"scale": norm_one}}
               if cfg.sandwich_norms else {}),
            **({"q_norm": {"scale": (jnp.zeros if cfg.rms_norm_unit_offset
                                     else jnp.ones)((hd,), dtype)},
                "k_norm": {"scale": (jnp.zeros if cfg.rms_norm_unit_offset
                                     else jnp.ones)((hd,), dtype)}}
               if cfg.qk_norm else {}),
            "mlp": (_moe_init(ks[4], cfg, dtype) if cfg.num_experts > 0
                    else {
                "gate": _linear_init(ks[4], cfg.hidden_size,
                                     cfg.intermediate_size, False, dtype),
                "up": _linear_init(ks[5], cfg.hidden_size,
                                   cfg.intermediate_size, False, dtype),
                "down": _linear_init(ks[6], cfg.intermediate_size,
                                     cfg.hidden_size, False, dtype),
            }),
        })
    return params


def _moe_init(key, cfg: LLMConfig, dtype):
    """Mixtral-style sparse MoE block: a router + E SwiGLU experts with
    a leading expert dim (sharded over 'ep' — parallel/sharding.py)."""
    E, h, inter = cfg.num_experts, cfg.hidden_size, cfg.intermediate_size
    kr, kg, ku, kd = jax.random.split(key, 4)
    std_h, std_i = h ** -0.5, inter ** -0.5

    def ew(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    return {
        "router": {"w": ew(kr, (h, E), std_h)},
        "experts": {
            "gate": ew(kg, (E, h, inter), std_h),
            "up": ew(ku, (E, h, inter), std_h),
            "down": ew(kd, (E, inter, h), std_i),
        },
    }


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _rms_norm(x, scale, eps, unit_offset=False):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    w = scale.astype(jnp.float32)
    if unit_offset:
        # gemma convention: weight stored zero-centered, y = x̂·(1+w)
        w = 1.0 + w
    return (x32 * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def _mlp_act(cfg: LLMConfig):
    if cfg.hidden_act == "gelu_tanh":    # gemma GeGLU
        return functools.partial(jax.nn.gelu, approximate=True)
    return jax.nn.silu


def _proj(p, x, lora=None, lora_scale=1.0):
    if lora is not None and "m" in lora:
        # DoRA (gllm/lora.py dora_init): y = x @ (m ⊙ W'/||W'||_col)
        # with W' = W + scale*A@B. Materializes the merged weight per
        # call — a training-only adapter mode (adapter.py:241 use_dora).
        w_eff = (p["w"].astype(jnp.float32)
                 + (lora["a"].astype(jnp.float32)
                    @ lora["b"].astype(jnp.float32)) * lora_scale)
        col = lora["m"].astype(jnp.float32) / (
            jnp.linalg.norm(w_eff, axis=0) + 1e-6)
        y = (x @ (w_eff * col[None, :]).astype(x.dtype))
        if "b" in p:
            y = y + p["b"]
        return y
    if "w_q" in p:
        # int8 weight-only: upcast inside the matmul, per-channel scale on
        # the output (gllm/quantize.py) — halves HBM traffic at decode
        y = (x @ p["w_q"].astype(x.dtype)) * p["scale"].astype(x.dtype)
    elif "w_qa" in p:
        # W8A8 (gllm/quantize.py act_int8): per-token dynamic activation
        # quant, both operands native int8 on the MXU (s8xs8->s32) — no
        # VPU weight convert, so weights stream at raw HBM bandwidth
        # (probe_int4.py on v5e: 715 vs 557 Gparam/s weight-only)
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        xs = jnp.maximum(amax, 1e-6) / 127.0
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                      -127, 127).astype(jnp.int8)
        y32 = jax.lax.dot_general(
            x8, p["w_qa"], (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = (y32.astype(jnp.float32) * xs
             * p["scale"].astype(jnp.float32)).astype(x.dtype)
    elif "w_q4" in p:
        # int4 weight-only (gllm/quantize.py): group-wise scales along the
        # contraction dim. Each group contracts separately (batched
        # dot_general) with the scale folded in AFTER, so the weight
        # operand stays a pure int4->bf16 convert fused into the HBM read.
        wq, s = p["w_q4"], p["scale"].astype(x.dtype)
        g = s.shape[0]
        if g == 1:
            y = (x @ wq.astype(x.dtype)) * s[0]
        else:
            in_dim, out_dim = wq.shape
            lead = x.shape[:-1]
            xg = x.reshape(-1, g, in_dim // g).transpose(1, 0, 2)  # [G,M,gs]
            yg = jax.lax.dot_general(
                xg, wq.reshape(g, in_dim // g, out_dim).astype(x.dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))))     # [G,M,out]
            y = jnp.sum(yg * s[:, None, :], axis=0).reshape(*lead, out_dim)
    else:
        y = x @ p["w"]
    if lora is not None:
        # adapter math runs in the adapter dtype (f32); the delta casts
        # back so bf16 activations stay bf16 (a f32 promotion here broke
        # the scan-over-layers carry type)
        y = y + (((x @ lora["a"]) @ lora["b"]) * lora_scale).astype(y.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def rope_frequencies(cfg: LLMConfig) -> jnp.ndarray:
    """Inverse frequencies with optional llama3.1 / linear scaling
    (model_utils/rope.py parity)."""
    hd = cfg.head_dim_
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    if cfg.rope_scaling == "llama3":
        low = cfg.rope_original_max_position / cfg.rope_low_freq_factor
        high = cfg.rope_original_max_position / cfg.rope_high_freq_factor
        wavelen = 2 * np.pi / inv
        smooth = np.clip(
            (cfg.rope_original_max_position / wavelen - cfg.rope_low_freq_factor)
            / (cfg.rope_high_freq_factor - cfg.rope_low_freq_factor), 0.0, 1.0)
        scaled = np.where(
            wavelen > low, inv / cfg.rope_scaling_factor,
            np.where(wavelen < high, inv,
                     (1 - smooth) * inv / cfg.rope_scaling_factor + smooth * inv))
        inv = scaled
    elif cfg.rope_scaling == "linear":
        inv = inv / cfg.rope_scaling_factor
    elif cfg.rope_scaling == "dynamic":
        # NTK-aware theta rescale at the configured max length
        # (model_utils/rope.py dynamic variant, evaluated statically at
        # max_position_embeddings as the reference does at patch time)
        ratio = max(cfg.max_position_embeddings
                    / max(cfg.rope_original_max_position, 1), 1.0)
        alpha = (cfg.rope_scaling_factor * ratio
                 - (cfg.rope_scaling_factor - 1.0))
        theta = cfg.rope_theta * alpha ** (hd / max(hd - 2, 1))
        inv = 1.0 / (theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    return jnp.asarray(inv, jnp.float32)


def rope_frequencies_local(cfg: LLMConfig) -> Optional[jnp.ndarray]:
    """gemma3 local-layer rope table: plain inverse frequencies at
    rope_local_base_freq, NO scaling (HF Gemma3 rotary_emb_local uses
    the default rope for sliding layers; scaling applies only to the
    global table). None when the config has a single rope."""
    if cfg.rope_local_base_freq is None:
        return None
    hd = cfg.head_dim_
    inv = 1.0 / (cfg.rope_local_base_freq
                 ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    return jnp.asarray(inv, jnp.float32)


def _apply_rope(x, positions, inv_freq):
    """x: [B, S, H, Dh]; positions: [B, S]."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq[None, None, :]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _flash_ok(cfg: LLMConfig, s: int) -> bool:
    hd = cfg.head_dim_
    return (cfg.use_flash
            and jax.devices()[0].platform == "tpu"
            and s >= cfg.flash_min_seq
            and s % 128 == 0
            and hd in (128, 256))


def _flash_attention(q, k, v, attention_mask, cfg: LLMConfig):
    """Causal flash attention over the padded sequence (training/prefill).

    q [B,S,H,D], k/v [B,S,KV,D]; GQA expands KV heads; padding tokens go
    to segment 0 so real tokens never attend them (jaxlib's Pallas TPU
    flash kernel, differentiable)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    b, s, h, d = q.shape
    kv = k.shape[2]
    if kv != h:
        reps = h // kv
        k = jnp.repeat(k, reps, axis=2)
        v = jnp.repeat(v, reps, axis=2)
    qt = jnp.moveaxis(q, 2, 1)  # [B,H,S,D]
    kt = jnp.moveaxis(k, 2, 1)
    vt = jnp.moveaxis(v, 2, 1)
    seg = attention_mask.astype(jnp.int32)
    out = flash_attention(
        qt, kt, vt, causal=True,
        segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=1.0 / np.sqrt(d))
    return jnp.moveaxis(out, 1, 2).reshape(b, s, h * d)


def _s2_attention(q, k, v, attention_mask, group_size: int):
    """LongLoRA S²-attn (shift short attention) — training-only grouped
    attention (model_utils/longlora.py:84-121): kv heads expand to full
    heads, the second half of heads rolls by -group_size//2 along the
    sequence, attention runs within groups of `group_size` (causal +
    key-valid within each group), and outputs roll back.

    Divergence note: the reference reuses the FIRST group's sliced mask
    block for every group (longlora.py:98-99); we build each group's
    key-validity from the actual attention_mask — the intended behavior.
    """
    b, s, h, d = q.shape
    kv = k.shape[2]
    if kv != h:
        reps = h // kv
        k = jnp.repeat(k, reps, axis=2)
        v = jnp.repeat(v, reps, axis=2)
    ng = s // group_size
    half = h // 2
    shift = group_size // 2

    def roll_half(x, amount):
        return jnp.concatenate(
            [x[:, :, :half], jnp.roll(x[:, :, half:], amount, axis=1)],
            axis=2)

    def group(x):
        return x.reshape(b * ng, group_size, h, d)

    qg = group(roll_half(q, -shift))
    kg = group(roll_half(k, -shift))
    vg = group(roll_half(v, -shift))
    causal = jnp.tril(jnp.ones((group_size, group_size), bool))
    # the shifted half's keys are ROLLED tokens, so their validity mask
    # must roll identically — one shared mask would let shifted heads
    # attend pad keys near the end and mask out wrapped-in valid keys
    key_valid = attention_mask > 0                         # [B, S]
    m_plain = (causal[None] &
               key_valid.reshape(b * ng, group_size)[:, None, :])
    m_shift = (causal[None] &
               jnp.roll(key_valid, -shift, axis=1)
               .reshape(b * ng, group_size)[:, None, :])
    half_d = half  # heads are grouped as [unshifted half | shifted half]
    out_plain = _attention(qg[:, :, :half_d], kg[:, :, :half_d],
                           vg[:, :, :half_d], m_plain)
    out_shift = _attention(qg[:, :, half_d:], kg[:, :, half_d:],
                           vg[:, :, half_d:], m_shift)
    out = jnp.concatenate(
        [out_plain.reshape(b * ng, group_size, half_d, d),
         out_shift.reshape(b * ng, group_size, h - half_d, d)],
        axis=2).reshape(b, s, h, d)
    out = roll_half(out, shift)
    return out.reshape(b, s, h * d)


def _quantize_kv(x):
    """[B,S,KV,D] -> (int8 values, f32 per-token-per-head scales).

    int8 KV cache halves decode HBM traffic at long context (the weights
    are already int8-capable via gllm/quantize.py; past ~4k tokens the
    cache reads dominate). Symmetric per-(token, head) scaling keeps the
    quantization error ~0.4% of the head's dynamic range."""
    x32 = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(x32), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def make_kv_cache(cfg: LLMConfig, batch: int, total: int, compute_dtype,
                  stacked: bool):
    """Preallocated KV cache matching the param storage layout (stacked
    [L, B, T, KV, D] dict for scan-over-layers, else a per-layer list).
    dtype follows cfg.kv_cache_dtype — int8 adds the per-(token, head)
    scale planes. The single allocator for generate() and the
    slot-based continuous decoder (gllm/continuous.py)."""
    hd = cfg.head_dim_
    int8_kv = cfg.kv_cache_dtype == "int8"
    kv_dt = jnp.int8 if int8_kv else compute_dtype

    def entry(lead=()):
        e = {"k": jnp.zeros((*lead, batch, total, cfg.num_kv_heads, hd),
                            kv_dt),
             "v": jnp.zeros((*lead, batch, total, cfg.num_kv_heads, hd),
                            kv_dt)}
        if int8_kv:
            e["k_scale"] = jnp.zeros((*lead, batch, total,
                                      cfg.num_kv_heads), jnp.float32)
            e["v_scale"] = jnp.zeros((*lead, batch, total,
                                      cfg.num_kv_heads), jnp.float32)
        return e

    if stacked:
        return entry(lead=(cfg.num_layers,))
    return [entry() for _ in range(cfg.num_layers)]


def extend_kv_cache(cache, extra: int):
    """Grow the cache's T axis by `extra` zero slots (invalid until
    written). Used by the design-query extension (composite.py): the
    decode may have filled its cache exactly, and appending the
    <design_start>+K body tokens needs room. One O(cache) copy —
    ~10 ms at the 8B b96 serving shape, vs re-forwarding the whole
    prompt+analysis sequence."""
    def pad_entry(e, t_axis):
        out = {}
        for name, buf in e.items():
            pw = [(0, 0)] * buf.ndim
            pw[t_axis] = (0, extra)
            out[name] = jnp.pad(buf, pw)
        return out
    if isinstance(cache, dict):        # stacked [L, B, T, KV, D]
        return pad_entry(cache, 2)
    return [pad_entry(e, 1) for e in cache]


def _cache_append(entry, k, v, cache_index):
    """Write new k/v rows at cache_index, quantizing if the cache is
    int8. cache_index may be a scalar (all rows share one write offset
    — the generate() layout) or per-row [B] (slot-based continuous
    decode, gllm/continuous.py — each slot is at its own depth)."""
    if jnp.ndim(cache_index) == 1:
        b = k.shape[0]
        s = k.shape[1]
        rows = jnp.arange(b)[:, None]                    # [B, 1]
        cols = cache_index[:, None] + jnp.arange(s)[None, :]  # [B, S]

        def upd(buf, val):
            return buf.at[rows, cols].set(val.astype(buf.dtype),
                                          mode="drop")
    else:
        def upd(buf, val):
            return jax.lax.dynamic_update_slice_in_dim(
                buf, val.astype(buf.dtype), cache_index, 1)
    if entry["k"].dtype == jnp.int8:
        kq, ks = _quantize_kv(k)
        vq, vs = _quantize_kv(v)
        return {"k": upd(entry["k"], kq), "k_scale": upd(entry["k_scale"], ks),
                "v": upd(entry["v"], vq), "v_scale": upd(entry["v_scale"], vs)}
    return {"k": upd(entry["k"], k), "v": upd(entry["v"], v)}


def _cache_read(entry, dtype):
    """Dequantize-on-read; XLA fuses the scale multiply into the
    attention matmul's operand, so HBM still only moves int8 + scales."""
    if entry["k"].dtype == jnp.int8:
        k = entry["k"].astype(dtype) * entry["k_scale"][..., None].astype(dtype)
        v = entry["v"].astype(dtype) * entry["v_scale"][..., None].astype(dtype)
        return k, v
    return entry["k"], entry["v"]


def _attention(q, k, v, mask_bkq, scale=None, softcap=None):
    # q:[B,S,H,D] k,v:[B,T,KV,D]
    b, s, h, d = q.shape
    kv = k.shape[2]
    groups = h // kv
    q = q.reshape(b, s, kv, groups, d)
    logits = jnp.einsum("bskgd,btkd->bkgst", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (scale if scale is not None else 1.0 / np.sqrt(d))
    if softcap is not None:   # gemma2 attn_logit_softcapping
        logits = softcap * jnp.tanh(logits / softcap)
    logits = jnp.where(mask_bkq[:, None, None, :, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bkgst,btkd->bskgd", probs, v)
    return out.reshape(b, s, h * d)


def _moe_mlp(p, x, cfg: LLMConfig, token_valid=None):
    """Sparse-MoE SwiGLU (Mixtral semantics) with static-capacity
    GShard dispatch — returns (y, aux_loss).

    Each (token, slot) unit routes to its top-k expert; a stable sort
    by expert id assigns capacity positions (arrival order within an
    expert) and overflow units drop (combine weight zero). Dispatch and
    combine are gather/scatter through a static [E*C, H] buffer — all
    shapes static, linear in tokens, and the expert dim shards cleanly
    over an 'ep' mesh axis.

    token_valid [T] masks padding: pad tokens neither consume expert
    capacity nor count toward the aux loss (HF's attention_mask-aware
    load_balancing_loss_func). aux matches HF's magnitude — ≈ top_k at
    uniform routing per layer:
        aux = E · Σ_e (Σ_slots mean_valid_t mask_e) · mean_valid_t(P_e)."""
    b, s, h = x.shape
    T = b * s
    k = cfg.num_experts_per_tok
    E = cfg.num_experts
    xf = x.reshape(T, h)
    logits = (xf @ p["router"]["w"]).astype(jnp.float32)     # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, k)              # [T, k]
    weights = top_vals / jnp.clip(top_vals.sum(-1, keepdims=True), 1e-9)

    if token_valid is None:
        valid = jnp.ones((T,), jnp.float32)
    else:
        valid = token_valid.reshape(T).astype(jnp.float32)
    n_valid = jnp.clip(valid.sum(), 1.0, None)

    sel = jax.nn.one_hot(top_idx, E, dtype=jnp.float32)      # [T, k, E]
    sel = sel * valid[:, None, None]
    f = sel.sum(axis=(0, 1)) / n_valid                       # ≈ k/E each
    P = (probs * valid[:, None]).sum(axis=0) / n_valid
    aux = E * jnp.sum(f * P)

    U = T * k
    C = max(int(np.ceil(cfg.moe_capacity_factor * U / E)), 1)
    # sort-based dispatch: O(U log U + E*C*H) memory/compute instead of
    # a [U, E, C] one-hot (O(U²·factor/E) — quadratic in tokens). The
    # stable argsort preserves the arrival order of same-expert units,
    # so capacity decisions are IDENTICAL to the cumulative-one-hot
    # formulation (tests pin the semantics).
    unit_e = top_idx.reshape(U)
    unit_valid = jnp.broadcast_to(valid[:, None] > 0, (T, k)).reshape(U)
    # invalid units sort to a virtual expert E (past every real one)
    sort_key = jnp.where(unit_valid, unit_e, E)
    order = jnp.argsort(sort_key, stable=True)               # [U]
    sorted_e = sort_key[order]
    counts = jax.ops.segment_sum(jnp.ones((U,), jnp.int32),
                                 sort_key, num_segments=E + 1)
    starts = jnp.cumsum(counts) - counts                     # [E+1]
    rank = jnp.arange(U) - starts[sorted_e]                  # pos in expert
    keep_s = (rank < C) & (sorted_e < E)
    # overflow/invalid units land in a junk row at E*C
    slot_s = jnp.where(keep_s, sorted_e * C + jnp.clip(rank, 0, C - 1),
                       E * C)

    xu = jnp.repeat(xf, k, axis=0)                           # [U, H]
    buf = jnp.zeros((E * C + 1, h), x.dtype)
    buf = buf.at[slot_s].set(xu[order].astype(x.dtype), mode="drop")
    xe = buf[:E * C].reshape(E, C, h)
    ge = jnp.einsum("ech,ehi->eci", xe, p["experts"]["gate"])
    ue = jnp.einsum("ech,ehi->eci", xe, p["experts"]["up"])
    de = jnp.einsum("eci,eih->ech", jax.nn.silu(ge) * ue,
                    p["experts"]["down"])
    de_flat = jnp.concatenate(
        [de.reshape(E * C, h), jnp.zeros((1, h), de.dtype)], axis=0)
    yu_sorted = jnp.where(keep_s[:, None], de_flat[slot_s], 0.0)
    yu = jnp.zeros((U, h), x.dtype).at[order].set(
        yu_sorted.astype(x.dtype))
    y = (yu * weights.reshape(U, 1).astype(x.dtype)) \
        .reshape(T, k, h).sum(axis=1)
    return y.reshape(b, s, h), aux


def decoder_layer(layer, ll, x, *, cfg: LLMConfig, positions, inv_freq,
                  attention_mask, mask, lora_scale=1.0, train=False,
                  cache_entry=None, cache_index=None):
    """One transformer block (RMSNorm + RoPE GQA + SwiGLU), standalone so
    forward() and the pipeline-parallel runner (parallel/pipeline.py)
    share the exact same math. Returns (x, updated_cache|None,
    moe_aux scalar — 0.0 for dense MLP layers)."""
    b, s, _ = x.shape
    hd = cfg.head_dim_
    uo = cfg.rms_norm_unit_offset
    attn_scale = ((cfg.query_scale ** -0.5) if cfg.query_scale is not None
                  else None)
    la = (ll or {}).get("attn", {})
    h = _rms_norm(x, layer["input_norm"]["scale"], cfg.rms_norm_eps, uo)
    q = _proj(layer["attn"]["q"], h, la.get("q"), lora_scale)
    k = _proj(layer["attn"]["k"], h, la.get("k"), lora_scale)
    v = _proj(layer["attn"]["v"], h, la.get("v"), lora_scale)
    q = q.reshape(b, s, cfg.num_heads, hd)
    k = k.reshape(b, s, cfg.num_kv_heads, hd)
    v = v.reshape(b, s, cfg.num_kv_heads, hd)
    if cfg.qk_norm:   # qwen3: per-head RMSNorm before rope
        q = _rms_norm(q, layer["q_norm"]["scale"], cfg.rms_norm_eps, uo)
        k = _rms_norm(k, layer["k_norm"]["scale"], cfg.rms_norm_eps, uo)
    q = _apply_rope(q, positions, inv_freq)
    k = _apply_rope(k, positions, inv_freq)

    # S²/flash paths assume plain scaled-dot-product causal attention —
    # gemma-style softcap/sliding/query-scale configs take the masked
    # einsum path (the mask argument already encodes the local window)
    plain_sdpa = (cfg.attn_logit_softcap is None and attn_scale is None
                  and cfg.sliding_window is None)
    if cache_entry is None:
        groupsz = int(s * cfg.group_size_ratio)
        if (cfg.shift_attn and train and groupsz >= 2
                and s % groupsz == 0 and plain_sdpa):
            attn = _s2_attention(q, k, v, attention_mask, groupsz)
        elif _flash_ok(cfg, s) and plain_sdpa:
            attn = _flash_attention(q, k, v, attention_mask, cfg)
            attn = attn.reshape(b, s, cfg.num_heads, hd).reshape(
                b, s, cfg.num_heads * hd)
        else:
            attn = _attention(q, k, v, mask, attn_scale,
                              cfg.attn_logit_softcap)
        updated_cache = None
    else:
        updated_cache = _cache_append(cache_entry, k, v, cache_index)
        ck, cv = _cache_read(updated_cache, x.dtype)
        attn = _attention(q, ck, cv, mask, attn_scale,
                          cfg.attn_logit_softcap)

    attn = _proj(layer["attn"]["o"], attn, la.get("o"), lora_scale)
    if cfg.sandwich_norms:   # gemma2 post_attention_layernorm
        attn = _rms_norm(attn, layer["post_attn_norm"]["scale"],
                         cfg.rms_norm_eps, uo)
    x = x + attn

    h = _rms_norm(x, layer["post_norm"]["scale"], cfg.rms_norm_eps, uo)
    if cfg.num_experts > 0:
        # sparse-MoE MLP (LoRA does not target the experts; adapters
        # cover the attention projections in MoE configs — init_lora
        # drops mlp targets when num_experts > 0)
        token_valid = (attention_mask.reshape(-1) > 0
                       if attention_mask is not None else None)
        mlp_out, aux = _moe_mlp(layer["mlp"], h, cfg,
                                token_valid=token_valid)
        return x + mlp_out, updated_cache, aux
    lm = (ll or {}).get("mlp", {})
    gate = _proj(layer["mlp"]["gate"], h, lm.get("gate"), lora_scale)
    up = _proj(layer["mlp"]["up"], h, lm.get("up"), lora_scale)
    mlp_out = _proj(layer["mlp"]["down"], _mlp_act(cfg)(gate) * up,
                    lm.get("down"), lora_scale)
    if cfg.sandwich_norms:   # gemma2 post_feedforward_layernorm
        mlp_out = _rms_norm(mlp_out, layer["post_mlp_norm"]["scale"],
                            cfg.rms_norm_eps, uo)
    return x + mlp_out, updated_cache, jnp.zeros((), jnp.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def forward(
    params: Params,
    cfg: LLMConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,      # [B, S]
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, S, H]
    attention_mask: Optional[jnp.ndarray] = None, # [B, S] 1 = real token
    positions: Optional[jnp.ndarray] = None,      # [B, S]
    kv_cache: Optional[List[Dict]] = None,        # per-layer {k, v}: [B, T, KV, D]
    cache_index: Optional[jnp.ndarray] = None,    # scalar write offset
    kv_valid: Optional[jnp.ndarray] = None,       # [B, T] cache key validity
    lora: Optional[Params] = None,
    lora_scale: float = 1.0,
    train: bool = False,   # gates training-only paths (S²-attn)
    last_logits_only: bool = False,  # serving prefill: skip the [B,S,V]
                                     # vocab matmul (12.6 GB f32 at 8B,
                                     # batch 8, 3k prompt — an OOM)
    return_moe_aux: bool = False,    # also return the summed MoE
                                     # load-balancing loss (training)
) -> Tuple[jnp.ndarray, ...]:
    """Returns (logits [B,S,V] f32, last_hidden [B,S,H], new_cache
    [, moe_aux])."""
    if inputs_embeds is None:
        inputs_embeds = params["embed"]["weight"][input_ids]
        if cfg.scale_embeddings:   # gemma: ×sqrt(hidden), in model dtype
            inputs_embeds = inputs_embeds * jnp.asarray(
                cfg.hidden_size ** 0.5, inputs_embeds.dtype)
    b, s, _ = inputs_embeds.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    if positions is None:
        positions = jnp.clip(jnp.cumsum(attention_mask, axis=-1) - 1, 0, None)

    inv_freq = rope_frequencies(cfg)
    inv_freq_local = rope_frequencies_local(cfg)  # gemma3 dual rope
    hd = cfg.head_dim_

    mask_local = None
    if kv_cache is None:
        # self-attention over the sequence itself: causal ∧ key-real
        causal = jnp.tril(jnp.ones((s, s), bool))
        mask = causal[None, :, :] & (attention_mask[:, None, :] > 0)
        if cfg.sliding_window is not None:
            # positional distance == position difference (pads are
            # masked anyway, so their clipped positions don't matter)
            dist = positions[:, :, None] - positions[:, None, :]
            mask_local = mask & (dist < cfg.sliding_window)
        t_len = s
    else:
        if isinstance(kv_cache, dict):  # stacked layout [L,B,T,KV,D]
            t_len = kv_cache["k"].shape[2]
        else:
            t_len = kv_cache[0]["k"].shape[1]
        # decode: queries attend to valid cache slots plus themselves.
        # cache_index scalar = one shared write offset (generate());
        # per-row [B] = slot-based continuous decode (each row at its
        # own depth, gllm/continuous.py)
        key_ok = kv_valid if kv_valid is not None else jnp.ones((b, t_len), bool)
        if jnp.ndim(cache_index) == 1:
            q_pos = cache_index[:, None] + jnp.arange(s)[None, :]  # [B, S]
            causal = (jnp.arange(t_len)[None, None, :]
                      <= q_pos[:, :, None])                       # [B, S, T]
            mask = key_ok[:, None, :] & causal
            dist_bst = (q_pos[:, :, None]
                        - jnp.arange(t_len)[None, None, :])       # [B, S, T]
        else:
            q_pos = cache_index + jnp.arange(s)
            causal = jnp.arange(t_len)[None, :] <= q_pos[:, None]  # [S, T]
            mask = key_ok[:, None, :] & causal[None, :, :]
            dist_bst = (q_pos[:, None]
                        - jnp.arange(t_len)[None, :])[None, :, :]  # [1, S, T]
        if cfg.sliding_window is not None:
            # cache slot index == sequence slot; with left padding the
            # pads sit at the front and are invalid, so slot distance
            # equals positional distance for every real (q, k) pair.
            # (the speculative-decode cache layout breaks this — generate
            # forces drafts off for sliding-window configs)
            mask_local = mask & (dist_bst < cfg.sliding_window)

    x = inputs_embeds
    new_cache = [] if kv_cache is not None else None
    aux_total = jnp.zeros((), jnp.float32)   # MoE load-balancing sum
    lora = match_lora_layout(params, lora)
    lora_layers = (lora or {}).get("layers") if lora else None

    def _mask_for(use_local):
        """Per-layer mask: global or sliding-window (gemma2 alternating
        local attention). use_local may be a python bool (layer loop) or
        a traced scalar (scan over stacked layers)."""
        if mask_local is None:
            return mask
        if isinstance(use_local, bool):
            return mask_local if use_local else mask
        return jnp.where(use_local, mask_local, mask)

    def _freq_for(use_local):
        """Per-layer rope table (gemma3 dual rope: sliding layers spin
        at rope_local_base_freq). Same bool-or-traced contract as
        _mask_for."""
        if inv_freq_local is None:
            return inv_freq
        if isinstance(use_local, bool):
            return inv_freq_local if use_local else inv_freq
        return jnp.where(use_local, inv_freq_local, inv_freq)

    # traced per-layer local-attention flags for the scan-storage path
    is_local = jnp.asarray(
        [not cfg.is_global_layer(i) for i in range(cfg.num_layers)])

    def layer_body(x, layer, ll, cache_entry, layer_mask, layer_freq):
        return decoder_layer(
            layer, ll, x, cfg=cfg, positions=positions, inv_freq=layer_freq,
            attention_mask=attention_mask, mask=layer_mask,
            lora_scale=lora_scale, train=train, cache_entry=cache_entry,
            cache_index=cache_index)

    def nc_body(x, layer, ll, layer_mask, layer_freq):
        out, _, aux = layer_body(x, layer, ll, None, layer_mask, layer_freq)
        return out, aux

    run_nc = jax.checkpoint(nc_body) if (cfg.remat and kv_cache is None) \
        else nc_body

    if "layers_stacked" in params:
        # scan-over-layers: one compiled layer body for the whole depth
        # (stacked [L, ...] storage, gllm/stacked.py)
        stacked = params["layers_stacked"]
        lora_stacked = (lora or {}).get("layers_stacked") if lora else None

        if kv_cache is None:
            if lora_stacked is None:
                def scan_body_nl(carry, xs):
                    x, at = carry
                    layer, loc = xs
                    out, aux = run_nc(x, layer, {}, _mask_for(loc),
                                      _freq_for(loc))
                    return (out, at + aux), None
                (x, aux_total), _ = jax.lax.scan(
                    scan_body_nl, (x, aux_total), (stacked, is_local))
            else:
                def scan_body(carry, xs):
                    x, at = carry
                    layer, ll, loc = xs
                    out, aux = run_nc(x, layer, ll or {}, _mask_for(loc),
                                      _freq_for(loc))
                    return (out, at + aux), None
                (x, aux_total), _ = jax.lax.scan(
                    scan_body, (x, aux_total),
                    (stacked, lora_stacked, is_local))
        else:
            # kv_cache is a stacked dict {"k": [L,B,T,KV,D], "v": ...}
            def scan_body_cache(x, xs):
                if lora_stacked is None:
                    layer, centry, loc = xs
                    ll = {}
                else:
                    layer, ll, centry, loc = xs
                x, updated, _ = layer_body(x, layer, ll, centry,
                                           _mask_for(loc), _freq_for(loc))
                return x, updated

            xs = ((stacked, kv_cache, is_local) if lora_stacked is None
                  else (stacked, lora_stacked, kv_cache, is_local))
            x, new_cache = jax.lax.scan(scan_body_cache, x, xs)
    else:
        for i, layer in enumerate(params["layers"]):
            ll = lora_layers[i] if lora_layers else {}
            loc = not cfg.is_global_layer(i)
            layer_mask = _mask_for(loc)
            layer_freq = _freq_for(loc)
            if kv_cache is None:
                x, aux = run_nc(x, layer, ll, layer_mask, layer_freq)
                aux_total = aux_total + aux
            else:
                x, updated, _ = layer_body(x, layer, ll, kv_cache[i],
                                           layer_mask, layer_freq)
                new_cache.append(updated)

    logits, hidden = finalize_hidden(params, cfg, x,
                                     last_only=last_logits_only)
    if return_moe_aux:
        # HF's load_balancing_loss_func pools over layers (one loss of
        # magnitude ~top_k), so the per-layer sum averages by depth
        return (logits, hidden, new_cache,
                aux_total / max(cfg.num_layers, 1))
    return logits, hidden, new_cache


def finalize_hidden(params: Params, cfg: LLMConfig, x: jnp.ndarray,
                    last_only: bool = False):
    """Final RMSNorm + vocab head. The single source of the
    norm/tie-embeddings plumbing shared by forward(), the pipeline loss
    (parallel/pipeline.py), and the composite's pipelined LM path —
    returns (logits f32, hidden)."""
    hidden = _rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps,
                       cfg.rms_norm_unit_offset)
    head_in = hidden[:, -1:] if last_only else hidden
    if cfg.tie_word_embeddings:
        logits = head_in @ params["embed"]["weight"].T
    else:
        logits = _proj(params["lm_head"], head_in)
    logits = logits.astype(jnp.float32)
    if cfg.final_logit_softcap is not None:   # gemma2
        cap = cfg.final_logit_softcap
        logits = cap * jnp.tanh(logits / cap)
    return logits, hidden


def match_lora_layout(params: Params, lora):
    """Return `lora` in the same (stacked/list) layout as `params` — a
    mismatched adapter used to be IGNORED silently
    (tests/test_stacked.py::test_mismatched_lora_layout_converts)."""
    if not lora:
        return lora
    from .stacked import is_stacked, stack_layers, unstack_layers
    if "layers_stacked" in params and not is_stacked(lora):
        return stack_layers(lora)
    if "layers" in params and is_stacked(lora):
        return unstack_layers(lora)
    return lora


def lm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
            ignore_index: int = -100) -> jnp.ndarray:
    """Shifted CE (HF causal-LM loss semantics)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = shift_labels != ignore_index
    safe = jnp.where(mask, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(mask, nll, 0.0)
    return nll.sum() / jnp.clip(mask.sum(), 1, None)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def _apply_repetition_penalty(logits, seen_mask, penalty):
    """HF semantics: seen tokens' scores divide (if >0) or multiply
    (if <0) by the penalty."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, penalized, logits)


_TOP_P_CANDIDATES = 256  # top-p nucleus cap; see _warped_candidates


def _warped_candidates(logits, temperature, top_p, top_k, do_sample):
    """The warped (temperature/top-k/top-p) sampling distribution as a
    bounded candidate set, without a full-vocab sort.

    Returns (vals, idxs): warped logits over candidates (filtered entries
    at -1e30) and their vocab ids; idxs=None means vals covers the full
    vocab (identity indexing). Sampling categorical(vals) -> gather(idxs)
    is distribution-identical to greedy/HF-warper semantics; the set form
    additionally exposes per-token probabilities for speculative
    accept/reject (delta-draft rejection sampling).

    A full jnp.sort over [B, 128k] per decode step dominated sampled
    decoding; instead lax.top_k bounds the candidate set (top_k, or 256
    for top-p — at p <= 0.95 the nucleus virtually never exceeds that)
    and the cumulative mass uses the FULL distribution's logsumexp, so
    the kept set matches the exact algorithm whenever the nucleus fits
    the cap (it saturates to the cap otherwise)."""
    logits = jnp.nan_to_num(logits, neginf=-1e30, posinf=1e30)  # InfNan guard
    if not do_sample or temperature <= 0:
        idx = jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)
        return jnp.zeros_like(idx, jnp.float32), idx
    logits = (logits / max(temperature, 1e-5)).astype(jnp.float32)
    vocab = logits.shape[-1]
    use_top_k = bool(top_k) and 0 < top_k < vocab
    use_top_p = bool(top_p) and top_p < 1.0
    if not (use_top_k or use_top_p):
        return logits, None
    # an explicit top_k wins outright (even > 256); the candidate cap
    # only applies when top-p alone must bound the set
    kk = min(top_k if use_top_k else _TOP_P_CANDIDATES, vocab)
    vals, idxs = jax.lax.top_k(logits, kk)            # [B, kk] descending
    if use_top_p:
        if use_top_k:
            # HF warper order: top-k filters FIRST, top-p then measures
            # mass on the RENORMALIZED top-k distribution
            lse = jax.scipy.special.logsumexp(vals, axis=-1, keepdims=True)
        else:
            # pure top-p: mass is of the full distribution (the 256-cap
            # is exact whenever the nucleus fits it)
            lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        probs = jnp.exp(vals - lse)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_p   # smallest set reaching top_p
        keep = keep.at[:, 0].set(True)
        vals = jnp.where(keep, vals, -1e30)
    return vals, idxs


def _candidates_draw(key, vals, idxs):
    """Sample a vocab id from a (vals, idxs) candidate set."""
    choice = jax.random.categorical(key, vals, axis=-1).astype(jnp.int32)
    if idxs is None:
        return choice
    return jnp.take_along_axis(idxs, choice[..., None], axis=-1)[..., 0]


def _sample_token(key, logits, temperature, top_p, top_k, do_sample):
    """Temperature/top-k/top-p sampling (see _warped_candidates)."""
    vals, idxs = _warped_candidates(logits, temperature, top_p, top_k,
                                    do_sample)
    if not do_sample or temperature <= 0:
        return idxs[:, 0]
    return _candidates_draw(key, vals, idxs)


class LLM:
    """Thin stateless wrapper bundling config + jitted entry points."""

    def __init__(self, cfg: LLMConfig, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.dtype = dtype

    def init(self, key: jax.Array) -> Params:
        return init_params(key, self.cfg, self.dtype)

    def embed(self, params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
        e = params["embed"]["weight"][input_ids]
        if self.cfg.scale_embeddings:   # gemma: ×sqrt(hidden)
            e = e * jnp.asarray(self.cfg.hidden_size ** 0.5, e.dtype)
        return e

    def __call__(self, params, **kw):
        return forward(params, self.cfg, **kw)

    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=(
        "max_new_tokens", "temperature", "top_p", "top_k", "do_sample",
        "eos_ids", "pad_id", "lora_scale", "repetition_penalty",
        "return_trigger", "spec_tokens", "spec_ngram",
        "return_spec_iters", "return_decode_state", "reserve_cache_slots"))
    def generate(
        self,
        params: Params,
        rng: jax.Array,
        input_ids: jnp.ndarray,        # [B, P] left-padded
        attention_mask: jnp.ndarray,   # [B, P]
        *,
        max_new_tokens: int = 128,
        temperature: float = 0.6,
        top_p: float = 0.9,
        top_k: int = 0,
        do_sample: bool = True,
        eos_ids: Tuple[int, ...] = (),
        pad_id: int = 0,
        lora: Optional[Params] = None,
        lora_scale: float = 1.0,
        inputs_embeds: Optional[jnp.ndarray] = None,
        repetition_penalty: float = 1.0,
        return_trigger: bool = False,
        spec_tokens: Optional[int] = None,
        spec_ngram: int = 2,
        spec_probe: int = 8,
        spec_min_accept: float = 0.5,
        return_spec_iters: bool = False,
        return_decode_state: bool = False,
        reserve_cache_slots: int = 0,
        step_cap: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, ...]:
        """Returns (new_tokens [B, T], done [B]). Finished rows emit pad_id.

        step_cap: dynamic decode-step bound BELOW max_new_tokens. It
        rides the while_loop carry as a runtime int32 scalar, so every
        cap value reuses ONE compiled program — the planner uses it to
        budget the final expansion round of a planning wall (a fresh
        max_new_tokens value would instead recompile the 8B decode over
        the tunnel, ~60 s). Capped rows are reported not-done (their
        stop token never fired). Forces the plain per-token path: the
        speculative loop emits 1..K+1 tokens per iteration, which
        cannot honor an exact cap.

        return_decode_state appends a final element: {"cache", "kv_valid"}
        for the plain decode path (the valid cache region per row is
        exactly prompt + emitted tokens — stop tokens are never written),
        or None on the speculative path (its cache layout has rejected
        holes, so callers must fall back to a re-forward). Enables the
        design-query extension (composite._body_hidden_extend_jit).
        With return_trigger, also returns the stop token id per row
        ([B] int32, -1 if never stopped) so callers can dispatch on WHICH
        special token fired (reference-style interleaved trigger dispatch,
        modeling_llamole.py:1196-1284).

        Generation-config parity: config/generate/*.yaml temperature/top_p;
        stop on eos OR any added special token (mmsft/workflow.py:100-105
        builds the same eos set).

        spec_tokens > 0 enables prompt-lookup speculative decoding: K
        draft tokens proposed from the most recent spec_ngram-gram match
        in the prompt+generated history are verified in ONE forward
        (decode is weight-HBM-bound at 8B, so a K+1-token verify costs
        nearly the same as 1 token). Delta-draft rejection sampling keeps
        the output distribution EXACTLY that of the non-speculative path
        (accept draft d with prob p_warped(d); on rejection, resample
        from the renormalized residual with d excluded). Costs a larger
        KV cache (p + max_new*(K+1) slots; rejected slots are masked
        invalid, never compacted).

        spec_tokens=None (default) = auto: ON (K=2) for greedy decode,
        OFF for sampled decode (near-uniform targets measured 0.73x —
        pure overhead). An acceptance monitor makes auto-on safe: after
        spec_probe verify steps, if mean accepted drafts/step across the
        batch stays below spec_min_accept, the loop abandons drafting
        and finishes as a plain per-token decode — worst-case adversarial
        history costs only the probe window's verify overhead (~15% of
        spec_probe steps)."""
        cfg = self.cfg
        b, p = input_ids.shape
        # normalize the adapter layout ONCE, outside the decode loops —
        # forward() would otherwise re-derive it inside every loop body
        # and lean on XLA loop-invariant code motion to make it free
        lora = match_lora_layout(params, lora)
        if spec_tokens is None:
            spec_tokens = 2 if not do_sample else 0
        # sliding-window configs (gemma2): the speculative cache layout
        # breaks slot==position, which the local-attention mask relies
        # on — drafts stay off
        use_spec = (spec_tokens > 0 and max_new_tokens > 1
                    and repetition_penalty == 1.0
                    and cfg.sliding_window is None
                    and step_cap is None)
        # reserve_cache_slots: extra zero slots after the decode region so
        # a post-decode query extension (composite._body_hidden_extend_jit)
        # can append tokens WITHOUT an O(cache) grow-copy — the transient
        # grow of a [L,B,T,KV,D] 8B cache cost ~2 GB of peak HBM at the
        # b96 e2e shape, enough to tip the bench into OOM
        total = (p + max_new_tokens * ((spec_tokens + 1) if use_spec else 1)
                 + reserve_cache_slots)
        eos_arr = jnp.asarray(list(eos_ids) or [-1], jnp.int32)

        positions = jnp.clip(jnp.cumsum(attention_mask, -1) - 1, 0, None)

        # prefill with preallocated cache (layout follows param storage;
        # dtype follows cfg.kv_cache_dtype — int8 halves decode HBM reads)
        cache = make_kv_cache(cfg, b, total, self.dtype,
                              "layers_stacked" in params)
        kv_valid = jnp.concatenate(
            [attention_mask > 0, jnp.zeros((b, total - p), bool)], axis=1)

        logits, _, cache = forward(
            params, cfg,
            input_ids=input_ids if inputs_embeds is None else None,
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask, positions=positions,
            kv_cache=cache, cache_index=jnp.asarray(0),
            kv_valid=kv_valid, lora=lora, lora_scale=lora_scale,
            last_logits_only=True)

        use_rep = repetition_penalty != 1.0
        if use_rep:
            # tokens seen so far (prompt + generated) per row
            seen = jnp.zeros((b, cfg.vocab_size), bool)
            if inputs_embeds is None:
                seen = seen.at[
                    jnp.arange(b)[:, None], input_ids].max(
                    (attention_mask > 0))
        else:
            seen = jnp.zeros((b, 1), bool)  # placeholder carry

        last_logits = logits[:, -1]
        if use_rep:
            last_logits = _apply_repetition_penalty(
                last_logits, seen, repetition_penalty)
        rng, sub = jax.random.split(rng)
        next_tok = _sample_token(sub, last_logits, temperature, top_p,
                                 top_k, do_sample)
        if use_rep:
            seen = seen.at[jnp.arange(b), next_tok].set(True)
        done = jnp.isin(next_tok, eos_arr)
        trigger = jnp.where(done, next_tok, -1).astype(jnp.int32)
        next_tok = jnp.where(done, pad_id, next_tok)
        next_pos = positions[:, -1] + 1

        if use_spec:
            out, done, trigger, iters = self._speculative_loop(
                params, cache, kv_valid, next_tok, next_pos, done, trigger,
                rng, input_ids, attention_mask,
                p=p, max_new_tokens=max_new_tokens, K=spec_tokens,
                ngram=max(1, min(spec_ngram, 4)), eos_arr=eos_arr,
                pad_id=pad_id, temperature=temperature, top_p=top_p,
                top_k=top_k, do_sample=do_sample, lora=lora,
                lora_scale=lora_scale, probe_iters=spec_probe,
                min_accept=spec_min_accept)
            extra = (iters,) if return_spec_iters else ()
            if return_decode_state:
                extra = extra + (None,)   # spec cache layout has holes
            if return_trigger:
                return (out, done, trigger) + extra
            return (out, done) + extra

        # decode loop: a while_loop (not scan) so the program EXITS as
        # soon as every row has stopped — the fixed-length scan paid for
        # all max_new_tokens steps even when the batch finished early
        # (e.g. one_step_reaction's 512-token budget with analyses that
        # stop at <retro_start> after a few dozen tokens). Emitted
        # sequences are identical: finished rows emit pad either way.
        out_buf = jnp.full((b, max_new_tokens), pad_id, jnp.int32)
        # runtime step bound in the carry (NOT a trace constant: every
        # cap value must hit the same compiled program — see docstring)
        cap0 = jnp.asarray(
            max_new_tokens if step_cap is None
            else max(1, min(int(step_cap), max_new_tokens)), jnp.int32)

        def cond_fn(carry):
            t, cap = carry[0], carry[10]
            return (t < max_new_tokens) & (t < cap) & ~jnp.all(carry[4])

        def step(carry):
            (t, cache, tok, pos, done, kv_valid, seen, trig, rng, out,
             cap) = carry
            out = jax.lax.dynamic_update_slice_in_dim(
                out, tok[:, None], t, axis=1)
            kv_valid = jax.lax.dynamic_update_slice_in_dim(
                kv_valid, (~done)[:, None], p + t, axis=1)
            logits, _, cache = forward(
                params, cfg, input_ids=tok[:, None],
                positions=pos[:, None],
                kv_cache=cache, cache_index=p + t,
                kv_valid=kv_valid, lora=lora, lora_scale=lora_scale)
            step_logits = logits[:, -1]
            if use_rep:
                step_logits = _apply_repetition_penalty(
                    step_logits, seen, repetition_penalty)
            rng, sub = jax.random.split(rng)
            nxt = _sample_token(sub, step_logits, temperature, top_p,
                                top_k, do_sample)
            if use_rep:
                seen = seen.at[jnp.arange(b), nxt].set(True)
            stopped_now = ~done & jnp.isin(nxt, eos_arr)
            trig = jnp.where(stopped_now, nxt, trig)
            now_done = done | stopped_now
            nxt = jnp.where(now_done, pad_id, nxt)
            return (t + 1, cache, nxt, pos + 1, now_done, kv_valid, seen,
                    trig, rng, out, cap)

        final = jax.lax.while_loop(
            cond_fn,
            step,
            (jnp.asarray(0, jnp.int32), cache, next_tok, next_pos, done,
             kv_valid, seen, trigger, rng, out_buf, cap0))
        done, trigger, out = final[4], final[7], final[9]
        # keep the return arity consistent with the speculative path
        # (iters = per-token steps executed here)
        extra = (final[0],) if return_spec_iters else ()
        if return_decode_state:
            extra = extra + ({"cache": final[1], "kv_valid": final[5]},)
        if return_trigger:
            return (out, done, trigger) + extra
        return (out, done) + extra

    @staticmethod
    def _ngram_drafts(hist, hvalid, gen, p, L, ngram, K):
        """Propose K draft tokens per row: the continuation after the most
        recent occurrence of the trailing ngram in the token history.

        hist/hvalid: [B, L+1] history buffer (junk col at L); gen: [B]
        generated-token count (tail ends at column p+gen-1). Returns
        [B, K] int32 drafts (arbitrary tokens when no match — they cost
        nothing: the verify forward runs K+1 positions regardless and
        rejection sampling discards them)."""
        b = hist.shape[0]
        tail_cols = p + gen[:, None] - ngram + jnp.arange(ngram)[None]
        gram = jnp.take_along_axis(hist, jnp.clip(tail_cols, 0, L), 1)
        W = L - ngram + 1
        m = jnp.ones((b, W), bool)
        for s in range(ngram):
            m &= (hist[:, s:W + s] == gram[:, s:s + 1]) \
                 & hvalid[:, s:W + s]
        jpos = jnp.arange(W)
        # the gram ending at the tail always matches itself; require the
        # match to end strictly before the tail's last column
        m &= (jpos[None, :] + ngram) < (p + gen)[:, None]
        j_star = jnp.max(jnp.where(m, jpos[None, :], -1), axis=1)
        cols = jnp.clip(j_star[:, None] + ngram + jnp.arange(K)[None],
                        0, L)
        return jnp.take_along_axis(hist, cols, axis=1)

    def _speculative_loop(self, params, cache, kv_valid, x0, pos0, done0,
                          trigger0, rng, input_ids, attention_mask, *, p,
                          max_new_tokens, K, ngram, eos_arr, pad_id,
                          temperature, top_p, top_k, do_sample, lora,
                          lora_scale, probe_iters=8, min_accept=0.5):
        """Prompt-lookup speculative decode loop (traced inside generate).

        Each iteration: propose K drafts from the latest ngram match in
        the token history, verify [x, d1..dK] in one cached forward at
        slots [c, c+K], accept the longest prefix via delta-draft
        rejection sampling, emit accepted drafts + one freshly sampled
        token, and mark rejected cache slots invalid. Emits 1..K+1
        tokens per iteration, so a lax.while_loop (bounded by
        max_new_tokens iterations) replaces the per-token scan."""
        cfg = self.cfg
        b = x0.shape[0]
        L = p + max_new_tokens          # history width (exact positions)
        arK1 = jnp.arange(K + 1)
        bidx = jnp.arange(b)[:, None]

        # token history: left-padded prompt + generated tail (contiguous
        # at column p because prompts are left-padded); +1 junk column
        # absorbs masked scatter writes
        hist = jnp.zeros((b, L + 1), jnp.int32)
        hist = hist.at[:, :p].set(input_ids.astype(jnp.int32))
        hvalid = jnp.zeros((b, L + 1), bool)
        hvalid = hvalid.at[:, :p].set(attention_mask > 0)
        hist = hist.at[:, p].set(x0)
        hvalid = hvalid.at[:, p].set(~done0)

        out = jnp.full((b, max_new_tokens + 1), pad_id, jnp.int32)
        out = out.at[:, 0].set(x0)
        gen0 = jnp.ones((b,), jnp.int32)

        def cond(carry):
            it, tot_acc, tot_live = carry[0], carry[13], carry[14]
            # acceptance guard: once past the probe window, abandon
            # drafting when mean accepted drafts/verify-step falls below
            # min_accept — the continuation loop below finishes the
            # decode at plain per-token cost
            guard_ok = (it < probe_iters) | (
                tot_acc.astype(jnp.float32)
                >= min_accept * tot_live.astype(jnp.float32))
            return (it < max_new_tokens) & ~jnp.all(carry[5] | carry[6]) \
                & guard_ok

        def body(carry):
            (it, cache, kv_valid, x, pos_x, done, full, gen, hist, hvalid,
             out, trigger, rng, tot_acc, tot_live) = carry
            live = ~(done | full)

            drafts = self._ngram_drafts(hist, hvalid, gen, p, L, ngram, K)

            # ---- verify [x, d1..dK] in one forward -------------------
            c = p + it * (K + 1)
            block = jnp.concatenate([x[:, None], drafts], axis=1)
            posb = pos_x[:, None] + arK1[None, :]
            kv_v = jax.lax.dynamic_update_slice_in_dim(
                kv_valid, jnp.broadcast_to(live[:, None], (b, K + 1)),
                c, axis=1)
            logits, _, cache = forward(
                params, cfg, input_ids=block, positions=posb,
                kv_cache=cache, cache_index=c, kv_valid=kv_v,
                lora=lora, lora_scale=lora_scale)

            flat = logits.reshape(b * (K + 1), -1)
            vals, idxs = _warped_candidates(flat, temperature, top_p,
                                            top_k, do_sample)
            kk = vals.shape[-1]
            vals = vals.reshape(b, K + 1, kk)
            if idxs is not None:
                idxs = idxs.reshape(b, K + 1, kk)
            lse = jax.scipy.special.logsumexp(vals, axis=-1)   # [B, K+1]

            # p_warped(draft_i) under the distribution at block pos i
            if idxs is None:
                dvals = jnp.take_along_axis(
                    vals[:, :K], drafts[:, :, None], axis=-1)[..., 0]
                p_draft = jnp.exp(dvals - lse[:, :K])
            else:
                match = idxs[:, :K] == drafts[:, :, None]      # [B,K,kk]
                p_draft = jnp.sum(
                    jnp.where(match,
                              jnp.exp(vals[:, :K] - lse[:, :K, None]),
                              0.0), axis=-1)

            rng, k_acc, k_fresh, k_resid = jax.random.split(rng, 4)
            # greedy folds in exactly: p_draft is 1.0 iff draft==argmax,
            # else 0.0, and uniform() < 1.0 always holds on [0, 1)
            u = jax.random.uniform(k_acc, (b, K))
            accept = u < p_draft
            n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), 1), 1)

            fresh = _candidates_draw(k_fresh, vals, idxs)       # [B, K+1]
            if idxs is None:
                resid_vals = jnp.where(
                    jnp.arange(kk)[None, None, :] == drafts[:, :, None],
                    -1e30, vals[:, :K])
                resid = _candidates_draw(k_resid, resid_vals, None)
            else:
                resid_vals = jnp.where(idxs[:, :K] == drafts[:, :, None],
                                       -1e30, vals[:, :K])
                resid = _candidates_draw(k_resid, resid_vals, idxs[:, :K])

            # token at slot n_acc: residual resample if a draft was
            # rejected there, else a fresh draw after K accepted drafts
            x_sel = jnp.concatenate([resid, fresh[:, K:K + 1]], axis=1)
            x_new = jnp.take_along_axis(x_sel, n_acc[:, None], 1)[:, 0]

            # ---- emission: accepted drafts + the sampled token -------
            cand = jnp.concatenate([drafts, x_new[:, None]], axis=1)
            s_idx = arK1[None, :]
            tok = jnp.where(s_idx < n_acc[:, None], cand, x_new[:, None])
            base = ((s_idx <= n_acc[:, None]) & live[:, None]
                    & ((gen[:, None] + s_idx) < max_new_tokens))
            # stop-signal detection also covers the token landing exactly
            # on the budget boundary: the scan path sets done/trigger for
            # a stop token sampled at the final step even though it is
            # never emitted, and composite callers branch on trigger
            sig = ((s_idx <= n_acc[:, None]) & live[:, None]
                   & ((gen[:, None] + s_idx) <= max_new_tokens))
            is_eos = jnp.isin(tok, eos_arr)
            hit = is_eos & sig
            prior = jnp.cumsum(hit.astype(jnp.int32), 1) \
                - hit.astype(jnp.int32)
            emit = base & (prior == 0)
            hit = hit & (prior == 0)
            eos_row = jnp.any(hit, axis=1)
            first_eos = jnp.take_along_axis(
                tok, jnp.argmax(hit, axis=1)[:, None], 1)[:, 0]
            trigger = jnp.where(eos_row, first_eos, trigger)

            tok_out = jnp.where(is_eos, pad_id, tok)
            colO = jnp.where(emit, gen[:, None] + s_idx, max_new_tokens)
            out = out.at[bidx, colO].set(tok_out)
            colH = jnp.where(emit, p + gen[:, None] + s_idx, L)
            hist = hist.at[bidx, colH].set(tok)
            hvalid = hvalid.at[bidx, colH].set(emit)

            n_emit = jnp.sum(emit.astype(jnp.int32), axis=1)
            gen = gen + n_emit
            # `done` keeps the scan path's meaning (a stop token fired);
            # budget exhaustion only deactivates the row
            done = done | eos_row
            full = full | (gen >= max_new_tokens)
            # cache slot validity for future steps: x stays, accepted
            # drafts stay, rejected drafts are holes
            acc_slots = jnp.concatenate(
                [live[:, None],
                 live[:, None] & (jnp.arange(K)[None] < n_acc[:, None])],
                axis=1)
            kv_valid = jax.lax.dynamic_update_slice_in_dim(
                kv_valid, acc_slots, c, axis=1)
            pos_x = pos_x + n_emit
            x = jnp.where(done | full, pad_id, x_new)
            tot_acc = tot_acc + jnp.sum(jnp.where(live, n_acc, 0))
            tot_live = tot_live + jnp.sum(live.astype(jnp.int32))
            return (it + 1, cache, kv_valid, x, pos_x, done, full, gen,
                    hist, hvalid, out, trigger, rng, tot_acc, tot_live)

        zero = jnp.asarray(0, jnp.int32)
        carry = (zero, cache, kv_valid, x0, pos0,
                 done0, jnp.zeros_like(done0), gen0, hist, hvalid, out,
                 trigger0, rng, zero, zero)
        final = jax.lax.while_loop(cond, body, carry)
        (it_end, cache, kv_valid, x, pos_x, done, full, gen, hist, hvalid,
         out, trigger, rng, tot_acc, tot_live) = final

        # ---- guard continuation: plain per-token decode ------------------
        # Runs only when rows remain unfinished (guard tripped; the loop
        # above exits with done|fin all-True otherwise). Per-row emission
        # columns continue at gen. A row that fills its budget stays
        # live for ONE extra forward so the never-emitted boundary token
        # still sets done/trigger, exactly like the scan path's final
        # step (rows already budget-filled inside the spec loop can't be
        # recovered — their last token was replaced by pad — and retire
        # immediately).
        #
        # CACHE COMPACTION AT TRIP TIME: the spec cache spans
        # p + max_new*(K+1) slots and the decode's vector ops scale with
        # cache LENGTH, not validity — continuing over the long layout
        # measured 0.94x the plain scan at K=2 (NOTES_ROUND4 worst
        # case). Keys are stored post-RoPE and standard attention scores
        # depend only on slot content + the validity mask, so a per-row
        # stable gather of the valid slots into a compact
        # p + max_new + 1 cache (the scan path's own length, +1 for the
        # boundary-check forward) is correctness-neutral; the gather
        # costs one cache-sized read/write, runs only when the guard
        # actually tripped (lax.cond), and the continuation then writes
        # at per-row indices (forward takes a [B] cache_index — the
        # slot-pool machinery).
        Tc = p + max_new_tokens + 1
        need_cont = ~jnp.all(done | full)

        def _gather_T(buf, order, taxis):
            idx_shape = [1] * buf.ndim
            idx_shape[taxis - 1] = order.shape[0]
            idx_shape[taxis] = order.shape[1]
            return jnp.take_along_axis(buf, order.reshape(idx_shape),
                                       axis=taxis)

        def _compact_entry(e, order):
            return {name: _gather_T(buf, order,
                                    buf.ndim - (3 if name in ("k", "v")
                                                else 2))
                    for name, buf in e.items()}

        def _compact():
            # stable: valid slots first, original order preserved
            order = jnp.argsort(jnp.where(kv_valid, 0, 1), axis=1,
                                stable=True)[:, :Tc]
            if isinstance(cache, list):
                cache_c = [_compact_entry(e, order) for e in cache]
            else:
                cache_c = _compact_entry(cache, order)
            return cache_c, jnp.take_along_axis(kv_valid, order, axis=1)

        # the skip branch's zero tree must carry the SAME structure and
        # shapes as the compact branch (lax.cond requires identical avals)
        def _zero_like_compact():
            def z(buf, name_is_kv):
                taxis = buf.ndim - (3 if name_is_kv else 2)
                shape = list(buf.shape)
                shape[taxis] = Tc
                return jnp.zeros(tuple(shape), buf.dtype)

            def entry_z(e):
                return {name: z(buf, name in ("k", "v"))
                        for name, buf in e.items()}
            cz = ([entry_z(e) for e in cache] if isinstance(cache, list)
                  else entry_z(cache))
            return cz, jnp.zeros((b, Tc), bool)

        cache_c, kvv_c = jax.lax.cond(need_cont, _compact,
                                      _zero_like_compact)
        widx0 = jnp.sum(kvv_c.astype(jnp.int32), axis=1)   # per-row next slot
        bflat = jnp.arange(b)

        def cont_cond(carry):
            j = carry[0]
            return (j <= max_new_tokens) & ~jnp.all(carry[6] | carry[7])

        def cont_body(carry):
            (j, cache, kv_valid, widx, x, pos_x, done, fin, gen, out,
             trigger, rng) = carry
            live = ~(done | fin)
            at_boundary = gen >= max_new_tokens
            widx_c = jnp.clip(widx, 0, Tc - 1)
            kv_valid = kv_valid.at[bflat, widx_c].set(
                jnp.where(live, True, kv_valid[bflat, widx_c]))
            logits, _, cache = forward(
                params, cfg, input_ids=x[:, None], positions=pos_x[:, None],
                kv_cache=cache, cache_index=widx_c, kv_valid=kv_valid,
                lora=lora, lora_scale=lora_scale)
            rng, sub = jax.random.split(rng)
            nxt = _sample_token(sub, logits[:, -1], temperature, top_p,
                                top_k, do_sample)
            stopped = live & jnp.isin(nxt, eos_arr)
            trigger = jnp.where(stopped, nxt, trigger)
            emit = live & ~stopped & ~at_boundary
            col = jnp.where(emit, gen, max_new_tokens)
            out = out.at[jnp.arange(b), col].set(
                jnp.where(emit, nxt, pad_id))
            gen = gen + emit.astype(jnp.int32)
            done = done | stopped
            # boundary token checked -> retire; budget reached -> the
            # NEXT iteration is the row's boundary-check forward
            fin = fin | (live & at_boundary)
            pos_x = pos_x + live.astype(jnp.int32)
            widx = widx + live.astype(jnp.int32)
            x = jnp.where(done | fin, pad_id, nxt)
            return (j + 1, cache, kv_valid, widx, x, pos_x, done, fin,
                    gen, out, trigger, rng)

        cont = jax.lax.while_loop(
            cont_cond, cont_body,
            (zero, cache_c, kvv_c, widx0, x, pos_x, done, full, gen, out,
             trigger, rng))
        done, out, trigger = cont[6], cont[9], cont[10]
        # it_end = speculative iterations used: callers derive mean
        # accepted drafts per verify step (speculation-efficiency
        # diagnostic; == iteration count at guard trip when it tripped)
        return out[:, :max_new_tokens], done, trigger, it_end
