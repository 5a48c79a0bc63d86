"""HF-checkpoint converter tests (gllm/convert.py load_hf_weights).

Round-trip: emit a synthetic safetensors checkpoint in the exact HF key
layout (LlamaForCausalLM dense; MixtralForCausalLM block_sparse_moe)
from a known params tree, convert it back, and require leaf-exact
equality — so real downloads are a file copy away, not a code risk
(same strategy as tests/test_convert_schema.py for the graph modules).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from safetensors.numpy import save_file

from llamole_tpu.models.gllm import LLM, LLMConfig
from llamole_tpu.models.gllm.convert import load_hf_weights


def _dense_state_dict(params, cfg):
    sd = {"model.embed_tokens.weight": np.asarray(params["embed"]["weight"]),
          "model.norm.weight": np.asarray(params["final_norm"]["scale"]),
          "lm_head.weight": np.asarray(params["lm_head"]["w"]).T.copy()}
    names = {"q": "q_proj", "k": "k_proj", "v": "v_proj", "o": "o_proj"}
    for i, layer in enumerate(params["layers"]):
        pre = f"model.layers.{i}"
        sd[f"{pre}.input_layernorm.weight"] = np.asarray(
            layer["input_norm"]["scale"])
        sd[f"{pre}.post_attention_layernorm.weight"] = np.asarray(
            layer["post_norm"]["scale"])
        for name, hf in names.items():
            sd[f"{pre}.self_attn.{hf}.weight"] = np.asarray(
                layer["attn"][name]["w"]).T.copy()
            if "b" in layer["attn"][name]:
                sd[f"{pre}.self_attn.{hf}.bias"] = np.asarray(
                    layer["attn"][name]["b"])
        if "experts" in layer["mlp"]:
            sd[f"{pre}.block_sparse_moe.gate.weight"] = np.asarray(
                layer["mlp"]["router"]["w"]).T.copy()
            hf_w = {"gate": "w1", "up": "w3", "down": "w2"}
            ex = layer["mlp"]["experts"]
            for name, wk in hf_w.items():
                for e in range(ex[name].shape[0]):
                    sd[f"{pre}.block_sparse_moe.experts.{e}.{wk}.weight"] = \
                        np.asarray(ex[name][e]).T.copy()
        else:
            for name, hf in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
                sd[f"{pre}.mlp.{hf}.weight"] = np.asarray(
                    layer["mlp"][name]["w"]).T.copy()
    return sd


def _roundtrip(cfg, tmp_path):
    model = LLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    sd = _dense_state_dict(params, cfg)
    save_file(sd, str(tmp_path / "model.safetensors"))
    loaded = load_hf_weights(str(tmp_path), cfg, dtype=jnp.float32)
    ref = jax.tree_util.tree_leaves_with_path(params)
    got = dict(jax.tree_util.tree_leaves_with_path(loaded))
    assert len(got) == len(ref)
    for path, leaf in ref:
        np.testing.assert_allclose(np.asarray(got[path]), np.asarray(leaf),
                                   rtol=0, atol=0, err_msg=str(path))
    return loaded


def test_dense_hf_roundtrip(tmp_path):
    cfg = LLMConfig.tiny(vocab_size=64)
    cfg.attention_bias = True  # exercise the qkv bias keys (qwen2 style)
    _roundtrip(cfg, tmp_path)


def test_mixtral_moe_hf_roundtrip(tmp_path):
    cfg = LLMConfig.tiny_moe(vocab_size=64, num_experts=4, top_k=2)
    loaded = _roundtrip(cfg, tmp_path)
    assert loaded["layers"][0]["mlp"]["experts"]["gate"].shape[0] == 4


def test_moe_missing_expert_raises(tmp_path):
    cfg = LLMConfig.tiny_moe(vocab_size=32, num_experts=2, top_k=1)
    model = LLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    sd = _dense_state_dict(params, cfg)
    del sd["model.layers.0.block_sparse_moe.experts.1.w2.weight"]
    save_file(sd, str(tmp_path / "model.safetensors"))
    with pytest.raises(ValueError, match="missing MoE expert"):
        load_hf_weights(str(tmp_path), cfg, dtype=jnp.float32)


def test_vocab_resize_pads_embeddings(tmp_path):
    cfg = LLMConfig.tiny(vocab_size=64)
    model = LLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    sd = _dense_state_dict(params, cfg)
    save_file(sd, str(tmp_path / "model.safetensors"))
    big = LLMConfig.tiny(vocab_size=73)  # +9 specials (reference parity)
    loaded = load_hf_weights(str(tmp_path), big, dtype=jnp.float32)
    assert loaded["embed"]["weight"].shape[0] == 73
    assert loaded["lm_head"]["w"].shape[1] == 73
    # new rows initialize near the mean of the old embedding
    # (model_utils/embedding.py:32-73 noisy-mean init)
    mean = np.asarray(params["embed"]["weight"]).mean(axis=0)
    new_rows = np.asarray(loaded["embed"]["weight"][64:])
    assert np.abs(new_rows - mean[None, :]).max() < 0.2
