"""HF-export tests: gllm pytree -> safetensors checkpoint directory.

export_hf_weights must be the exact inverse of load_hf_weights
(convert.py), and the exported directory must be loadable by HF
transformers itself with matching logits — the reference's merged-model
export surface (src/train/tuner.py:68-103)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.models.gllm import LLMConfig
from llamole_tpu.models.gllm.convert import (export_hf_weights,
                                             load_hf_weights, to_hf_config)
from llamole_tpu.models.gllm.model import forward, init_params
from llamole_tpu.models.gllm.stacked import stack_layers


def _assert_tree_equal(a, b):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    assert (jax.tree.structure(a) == jax.tree.structure(b))
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dense_roundtrip_with_bias(tmp_path):
    cfg = LLMConfig.tiny(96)
    cfg.attention_bias = True   # qwen2-style q/k/v biases
    params = init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    export_hf_weights(params, cfg, str(tmp_path))
    assert (tmp_path / "model.safetensors").exists()
    back = load_hf_weights(str(tmp_path), cfg, dtype=jnp.float32)
    _assert_tree_equal(params, back)

    raw = json.load(open(tmp_path / "config.json"))
    assert raw["model_type"] == "llama"
    assert raw["attention_bias"] is True
    assert raw["torch_dtype"] == "float32"
    cfg2 = LLMConfig.from_hf_config(raw)
    for field in ("vocab_size", "hidden_size", "intermediate_size",
                  "num_layers", "num_heads", "num_kv_heads", "rope_theta",
                  "attention_bias", "tie_word_embeddings"):
        assert getattr(cfg2, field) == getattr(cfg, field), field


def test_tied_embeddings_roundtrip(tmp_path):
    cfg = LLMConfig.tiny(64)
    cfg.tie_word_embeddings = True
    params = init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    assert "lm_head" not in params
    export_hf_weights(params, cfg, str(tmp_path))
    raw = json.load(open(tmp_path / "config.json"))
    assert raw["tie_word_embeddings"] is True
    back = load_hf_weights(str(tmp_path), cfg, dtype=jnp.float32)
    assert "lm_head" not in back
    _assert_tree_equal(params, back)


def test_moe_roundtrip(tmp_path):
    cfg = LLMConfig.tiny_moe(80, num_experts=4, top_k=2)
    params = init_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    export_hf_weights(params, cfg, str(tmp_path))
    raw = json.load(open(tmp_path / "config.json"))
    assert raw["model_type"] == "mixtral"
    assert raw["num_local_experts"] == 4
    back = load_hf_weights(str(tmp_path), cfg, dtype=jnp.float32)
    _assert_tree_equal(params, back)


def test_sharded_export_roundtrip(tmp_path):
    """A tiny shard budget forces multi-file export + index; the loader
    reassembles it identically (reference "{export_size}GB" sharding)."""
    cfg = LLMConfig.tiny(64)
    params = init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    export_hf_weights(params, cfg, str(tmp_path), shard_gb=1e-5)
    index = json.load(open(tmp_path / "model.safetensors.index.json"))
    files = set(index["weight_map"].values())
    assert len(files) > 1
    total = sum(np.asarray(x).nbytes for x in jax.tree.leaves(params))
    assert index["metadata"]["total_size"] == total
    back = load_hf_weights(str(tmp_path), cfg, dtype=jnp.float32)
    _assert_tree_equal(params, back)


def test_stacked_params_export(tmp_path):
    """scan_layers stacked storage exports identically to list storage."""
    cfg = LLMConfig.tiny(64)
    params = init_params(jax.random.PRNGKey(4), cfg, jnp.float32)
    export_hf_weights(stack_layers(params), cfg, str(tmp_path))
    back = load_hf_weights(str(tmp_path), cfg, dtype=jnp.float32)
    _assert_tree_equal(params, back)


def test_bf16_export_preserves_dtype(tmp_path):
    cfg = LLMConfig.tiny(64)
    params = init_params(jax.random.PRNGKey(5), cfg, jnp.bfloat16)
    export_hf_weights(params, cfg, str(tmp_path))
    raw = json.load(open(tmp_path / "config.json"))
    assert raw["torch_dtype"] == "bfloat16"
    back = load_hf_weights(str(tmp_path), cfg, dtype=jnp.bfloat16)
    _assert_tree_equal(params, back)


def test_rope_scaling_in_config():
    cfg = LLMConfig.llama3_8b()
    raw = to_hf_config(cfg)
    assert raw["rope_scaling"]["rope_type"] == "llama3"
    cfg2 = LLMConfig.from_hf_config(raw)
    assert cfg2.rope_scaling == "llama3"
    assert cfg2.rope_scaling_factor == cfg.rope_scaling_factor


def test_merge_adapter_writes_hf_checkpoint(tmp_path):
    """main.py export end-to-end: the merged-LoRA model lands both in
    our msgpack format and as an HF checkpoint, and the two agree."""
    import os

    from llamole_tpu.train.export import merge_adapter
    from llamole_tpu.utils.serialization import load_pytree

    out = merge_adapter({
        "model_name_or_path": "",
        "template": "default",
        "finetuning_type": "lora",
        "lora_rank": 4,
        "compute_dtype": "float32",
        "export_dir": str(tmp_path / "exp"),
    })
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    raw = json.load(open(os.path.join(out, "config.json")))
    cfg = LLMConfig.from_hf_config(raw)
    hf_tree = load_hf_weights(out, cfg, dtype=jnp.float32)
    msgpack_tree = load_pytree(os.path.join(out, "model.msgpack"))
    _assert_tree_equal(msgpack_tree, hf_tree)


@pytest.mark.slow
def test_transformers_loads_export_with_matching_logits(tmp_path):
    """True interop proof: HF transformers loads the exported directory
    and produces the SAME logits as our forward — validates the weight
    naming, the transposes, config.json, and our transformer math
    against the HF reference implementation in one shot."""
    transformers = pytest.importorskip("transformers")
    import torch

    cfg = LLMConfig.tiny(128)
    params = init_params(jax.random.PRNGKey(6), cfg, jnp.float32)
    export_hf_weights(params, cfg, str(tmp_path))

    model = transformers.AutoModelForCausalLM.from_pretrained(
        str(tmp_path), torch_dtype=torch.float32)
    model.eval()
    ids = np.array([[1, 5, 9, 2, 7, 3, 11, 4]], np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    ours = np.asarray(forward(params, cfg, input_ids=jnp.asarray(ids))[0])
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)
