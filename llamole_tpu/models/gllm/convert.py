"""HF safetensors checkpoint -> gllm param pytree.

Weight-name mapping for LlamaForCausalLM-style checkpoints (covers
llama3 / qwen2 / mistral). Torch Linear stores [out, in]; we store
[in, out], so projection weights transpose on load.
"""

import json
import os
from typing import Dict

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
                layers[idx]["post_norm"]["scale"] = jnp.asarray(t, dtype)
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
