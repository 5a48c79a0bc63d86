"""HF safetensors checkpoint <-> gllm param pytree.

Weight-name mapping for LlamaForCausalLM-style checkpoints (covers
llama3 / qwen2 / mistral). Torch Linear stores [out, in]; we store
[in, out], so projection weights transpose on load.

export_hf_weights is the exact inverse: it writes a checkpoint
directory (safetensors shards + index + config.json) that HF
transformers loads directly — the reference's merged-model export
surface (src/train/tuner.py:68-103 save_pretrained with
"{export_size}GB" shards), so fine-tunes made here flow back into the
torch/HF ecosystem.
"""

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import LLMConfig


def _iter_safetensors(path: str):
    from safetensors import safe_open
    index_file = os.path.join(path, "model.safetensors.index.json")
    files = []
    if os.path.exists(index_file):
        with open(index_file) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        single = os.path.join(path, "model.safetensors")
        if os.path.exists(single):
            files = ["model.safetensors"]
    if not files:
        raise FileNotFoundError(f"no safetensors under {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


def load_hf_weights(path: str, cfg: LLMConfig, dtype=jnp.bfloat16) -> Dict:
    """Build the params tree from an HF checkpoint directory.

    Covers LlamaForCausalLM-style dense checkpoints (llama3 / qwen2 /
    mistral) and MixtralForCausalLM sparse-MoE checkpoints
    (block_sparse_moe gate/experts.N.w1-w3 keys -> the MoE layout of
    init_params: router [H,E], experts gate/up/down [E, ...])."""
    moe = cfg.num_experts > 0
    layers = [
        {
            "input_norm": {}, "post_norm": {},
            **({"post_attn_norm": {}, "post_mlp_norm": {}}
               if cfg.sandwich_norms else {}),
            **({"q_norm": {}, "k_norm": {}} if cfg.qk_norm else {}),
            "attn": {"q": {}, "k": {}, "v": {}, "o": {}},
            "mlp": ({"router": {},
                     "experts": {"gate": [None] * cfg.num_experts,
                                 "up": [None] * cfg.num_experts,
                                 "down": [None] * cfg.num_experts}}
                    if moe else {"gate": {}, "up": {}, "down": {}}),
        }
        for _ in range(cfg.num_layers)
    ]
    params: Dict = {"embed": {}, "layers": layers, "final_norm": {}}

    proj_map = {
        "self_attn.q_proj": ("attn", "q"), "self_attn.k_proj": ("attn", "k"),
        "self_attn.v_proj": ("attn", "v"), "self_attn.o_proj": ("attn", "o"),
        "mlp.gate_proj": ("mlp", "gate"), "mlp.up_proj": ("mlp", "up"),
        "mlp.down_proj": ("mlp", "down"),
    }
    # Mixtral expert ffn: w1 = gate, w3 = up, w2 = down
    moe_w_map = {"w1": "gate", "w3": "up", "w2": "down"}

    for key, tensor in _iter_safetensors(path):
        t = np.asarray(tensor)
        if key == "model.embed_tokens.weight":
            params["embed"]["weight"] = jnp.asarray(t, dtype)
        elif key == "model.norm.weight":
            params["final_norm"]["scale"] = jnp.asarray(t, dtype)
        elif key == "lm_head.weight":
            params["lm_head"] = {"w": jnp.asarray(t.T, dtype)}
        elif key.startswith("model.layers."):
            parts = key.split(".")
            idx = int(parts[2])
            rest = ".".join(parts[3:])
            if rest == "input_layernorm.weight":
                layers[idx]["input_norm"]["scale"] = jnp.asarray(t, dtype)
            elif rest == "post_attention_layernorm.weight":
                # llama-family: the pre-MLP norm. gemma2 sandwich layout:
                # the norm applied to the attention OUTPUT (pre-MLP is
                # pre_feedforward_layernorm below)
                target = ("post_attn_norm" if cfg.sandwich_norms
                          else "post_norm")
                layers[idx][target]["scale"] = jnp.asarray(t, dtype)
            elif rest == "pre_feedforward_layernorm.weight":
                layers[idx]["post_norm"]["scale"] = jnp.asarray(t, dtype)
            elif rest == "post_feedforward_layernorm.weight":
                layers[idx]["post_mlp_norm"]["scale"] = jnp.asarray(t, dtype)
            elif rest == "self_attn.q_norm.weight":   # qwen3 [head_dim]
                layers[idx]["q_norm"]["scale"] = jnp.asarray(t, dtype)
            elif rest == "self_attn.k_norm.weight":
                layers[idx]["k_norm"]["scale"] = jnp.asarray(t, dtype)
            elif rest == "block_sparse_moe.gate.weight":
                layers[idx]["mlp"]["router"]["w"] = jnp.asarray(t.T, dtype)
            elif rest.startswith("block_sparse_moe.experts."):
                # block_sparse_moe.experts.<e>.w{1,2,3}.weight
                ep = rest.split(".")
                e_idx, w_name = int(ep[2]), ep[3]
                name = moe_w_map[w_name]
                layers[idx]["mlp"]["experts"][name][e_idx] = t.T
            else:
                for hf_name, (group, name) in proj_map.items():
                    if rest == f"{hf_name}.weight":
                        layers[idx][group][name]["w"] = jnp.asarray(t.T, dtype)
                        break
                    if rest == f"{hf_name}.bias":
                        layers[idx][group][name]["b"] = jnp.asarray(t, dtype)
                        break

    if moe:
        # stack per-expert ffn weights into the [E, d_in, d_out] leaves
        for li, layer in enumerate(layers):
            if "w" not in layer["mlp"]["router"]:
                raise ValueError(
                    f"layer {li}: missing MoE router weight "
                    "(block_sparse_moe.gate.weight)")
            ex = layer["mlp"]["experts"]
            for name in ("gate", "up", "down"):
                missing = [i for i, w in enumerate(ex[name]) if w is None]
                if missing:
                    raise ValueError(
                        f"layer {li}: missing MoE expert weights "
                        f"{name} {missing}")
                ex[name] = jnp.asarray(np.stack(ex[name]), dtype)

    if cfg.tie_word_embeddings and "lm_head" not in params:
        pass  # forward uses embed.T when tied
    elif "lm_head" not in params:
        # some checkpoints tie implicitly
        params["lm_head"] = {"w": jnp.asarray(
            np.asarray(params["embed"]["weight"]).T, dtype)}

    # pad embeddings if the tokenizer grew (resize_vocab parity:
    # model_utils/embedding.py:32-73 noisy-mean init)
    # (export_hf_weights below writes the padded rows back out verbatim;
    # round-tripping an exported checkpoint re-enters here as a no-op)
    emb = params["embed"]["weight"]
    if emb.shape[0] < cfg.vocab_size:
        extra = cfg.vocab_size - emb.shape[0]
        mean = jnp.mean(emb.astype(jnp.float32), axis=0, keepdims=True)
        noise = np.random.default_rng(0).normal(
            0, 0.02, (extra, emb.shape[1])).astype(np.float32)
        params["embed"]["weight"] = jnp.concatenate(
            [emb, (mean + noise).astype(emb.dtype)], axis=0)
        if "lm_head" in params:
            head = params["lm_head"]["w"]
            mean_h = jnp.mean(head.astype(jnp.float32), axis=1, keepdims=True)
            noise_h = np.random.default_rng(1).normal(
                0, 0.02, (head.shape[0], extra)).astype(np.float32)
            params["lm_head"]["w"] = jnp.concatenate(
                [head, (mean_h + noise_h).astype(head.dtype)], axis=1)
    return params


# ---------------------------------------------------------------------------
# gllm pytree -> HF checkpoint (the inverse direction)
# ---------------------------------------------------------------------------

def _to_numpy(x) -> np.ndarray:
    """Device array -> CONTIGUOUS host array, preserving bfloat16
    (ml_dtypes). Contiguity matters: the transposed views the state
    dict builds below would otherwise reach safetensors as raw
    un-transposed buffers (it serializes memory, not strides)."""
    return np.ascontiguousarray(np.asarray(x))


def hf_state_dict(params: Dict, cfg: LLMConfig) -> Dict[str, np.ndarray]:
    """Flatten a gllm param tree into HF LlamaForCausalLM /
    MixtralForCausalLM weight names (inverse of load_hf_weights;
    [in, out] projections transpose back to torch's [out, in])."""
    from .stacked import is_stacked, unstack_layers
    if is_stacked(params):
        params = unstack_layers(params)

    out: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": _to_numpy(params["embed"]["weight"]),
        "model.norm.weight": _to_numpy(params["final_norm"]["scale"]),
    }
    if "lm_head" in params:
        out["lm_head.weight"] = _to_numpy(params["lm_head"]["w"].T)
    proj_map = {
        ("attn", "q"): "self_attn.q_proj", ("attn", "k"): "self_attn.k_proj",
        ("attn", "v"): "self_attn.v_proj", ("attn", "o"): "self_attn.o_proj",
        ("mlp", "gate"): "mlp.gate_proj", ("mlp", "up"): "mlp.up_proj",
        ("mlp", "down"): "mlp.down_proj",
    }
    moe_w_map = {"gate": "w1", "up": "w3", "down": "w2"}
    for idx, layer in enumerate(params["layers"]):
        pre = f"model.layers.{idx}."
        out[pre + "input_layernorm.weight"] = _to_numpy(
            layer["input_norm"]["scale"])
        if "post_attn_norm" in layer:   # gemma2 sandwich layout
            out[pre + "post_attention_layernorm.weight"] = _to_numpy(
                layer["post_attn_norm"]["scale"])
            out[pre + "pre_feedforward_layernorm.weight"] = _to_numpy(
                layer["post_norm"]["scale"])
            out[pre + "post_feedforward_layernorm.weight"] = _to_numpy(
                layer["post_mlp_norm"]["scale"])
        else:
            out[pre + "post_attention_layernorm.weight"] = _to_numpy(
                layer["post_norm"]["scale"])
        if "q_norm" in layer:   # qwen3 per-head q/k norms
            out[pre + "self_attn.q_norm.weight"] = _to_numpy(
                layer["q_norm"]["scale"])
            out[pre + "self_attn.k_norm.weight"] = _to_numpy(
                layer["k_norm"]["scale"])
        if "router" in layer["mlp"]:
            out[pre + "block_sparse_moe.gate.weight"] = _to_numpy(
                layer["mlp"]["router"]["w"].T)
            for name, w_name in moe_w_map.items():
                stacked = _to_numpy(layer["mlp"]["experts"][name])
                for e in range(stacked.shape[0]):
                    out[(f"{pre}block_sparse_moe.experts.{e}."
                         f"{w_name}.weight")] = np.ascontiguousarray(
                        stacked[e].T)
        for (group, name), hf_name in proj_map.items():
            if group == "mlp" and "router" in layer["mlp"]:
                continue
            leaf = layer[group][name]
            out[f"{pre}{hf_name}.weight"] = _to_numpy(leaf["w"].T)
            if "b" in leaf:
                out[f"{pre}{hf_name}.bias"] = _to_numpy(leaf["b"])
    return out


def to_hf_config(cfg: LLMConfig, params: Optional[Dict] = None) -> dict:
    """HF config.json dict for an exported checkpoint (inverse of
    LLMConfig.from_hf_config). vocab_size follows the actual embedding
    rows when params are given (resize_vocab may have grown them)."""
    moe = cfg.num_experts > 0
    vocab = cfg.vocab_size
    tied = cfg.tie_word_embeddings
    torch_dtype = "bfloat16"
    if params is not None:
        emb = params["embed"]["weight"]
        vocab = int(emb.shape[0])
        tied = "lm_head" not in params
        torch_dtype = {"float32": "float32", "float16": "float16"}.get(
            str(emb.dtype), "bfloat16")
    gemma = cfg.sandwich_norms
    gemma3 = gemma and cfg.qk_norm  # gemma3: sandwich norms + q/k norms
    qwen3 = cfg.qk_norm and not gemma
    arch = ("MixtralForCausalLM" if moe
            else "Gemma3ForCausalLM" if gemma3
            else "Gemma2ForCausalLM" if gemma
            else "Qwen3ForCausalLM" if qwen3
            else "LlamaForCausalLM")
    raw = {
        "architectures": [arch],
        "model_type": ("mixtral" if moe
                       else "gemma3_text" if gemma3
                       else "gemma2" if gemma
                       else "qwen3" if qwen3 else "llama"),
        "vocab_size": vocab,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim_,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_norm_eps,
        "attention_bias": cfg.attention_bias,
        "tie_word_embeddings": tied,
        "max_position_embeddings": cfg.max_position_embeddings,
        "hidden_act": "silu",
        "torch_dtype": torch_dtype,
    }
    if cfg.rope_scaling:
        raw["rope_scaling"] = {
            "rope_type": cfg.rope_scaling,
            "factor": cfg.rope_scaling_factor,
            "low_freq_factor": cfg.rope_low_freq_factor,
            "high_freq_factor": cfg.rope_high_freq_factor,
            "original_max_position_embeddings":
                cfg.rope_original_max_position,
        }
    if moe:
        raw["num_local_experts"] = cfg.num_experts
        raw["num_experts_per_tok"] = cfg.num_experts_per_tok
        raw["router_aux_loss_coef"] = cfg.moe_aux_loss_coef
    if gemma:
        raw["hidden_activation"] = "gelu_pytorch_tanh"
        raw["query_pre_attn_scalar"] = (cfg.query_scale
                                        or float(cfg.head_dim_))
        raw["sliding_window"] = cfg.sliding_window
        if gemma3:
            raw["sliding_window_pattern"] = cfg.sliding_window_pattern
            raw["rope_local_base_freq"] = cfg.rope_local_base_freq
        else:
            raw["attn_logit_softcapping"] = cfg.attn_logit_softcap
            raw["final_logit_softcapping"] = cfg.final_logit_softcap
    return raw


def export_hf_weights(params: Dict, cfg: LLMConfig, out_dir: str,
                      shard_gb: float = 5.0) -> None:
    """Write an HF-loadable checkpoint directory: safetensors shard(s)
    (+ model.safetensors.index.json past shard_gb) and config.json
    (reference export surface: tuner.py:68-103 "{export_size}GB"
    sharding). load_hf_weights(out_dir, cfg) round-trips exactly."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    state = hf_state_dict(params, cfg)

    shard_bytes = int(shard_gb * 1024 ** 3)
    shards: list = [[]]
    sizes = [0]
    for key, tensor in state.items():
        nbytes = tensor.nbytes
        if sizes[-1] and sizes[-1] + nbytes > shard_bytes:
            shards.append([])
            sizes.append(0)
        shards[-1].append(key)
        sizes[-1] += nbytes

    if len(shards) == 1:
        save_file(state, os.path.join(out_dir, "model.safetensors"))
    else:
        n = len(shards)
        weight_map: Dict[str, str] = {}
        for i, keys in enumerate(shards):
            fname = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
            save_file({k: state[k] for k in keys},
                      os.path.join(out_dir, fname))
            weight_map.update({k: fname for k in keys})
        with open(os.path.join(out_dir,
                               "model.safetensors.index.json"), "w") as f:
            json.dump({"metadata": {"total_size": int(sum(sizes))},
                       "weight_map": weight_map}, f, indent=2)

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(to_hf_config(cfg, params), f, indent=2)
