"""Qwen3 family support (per-head QK-norm): logit and greedy-decode
parity against the actual HF torch Qwen3ForCausalLM, conversion round
trip, and config mapping. Reference analog: the base-LLM loading
surface (src/model/loader.py:148-220) — qwen3 is a beyond-reference
family."""

import json

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from llamole_tpu.models.gllm import LLM, LLMConfig  # noqa: E402
from llamole_tpu.models.gllm.convert import load_hf_weights  # noqa: E402


def _tiny_hf_qwen3(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_act="silu", attention_bias=False,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg).eval()
    # non-trivial q/k norm weights (init is all-ones => a missing norm
    # would silently pass the parity check)
    with torch.no_grad():
        for layer in model.model.layers:
            layer.self_attn.q_norm.weight.mul_(1.7).add_(0.1)
            layer.self_attn.k_norm.weight.mul_(0.6).sub_(0.05)
    d = tmp_path / "hf_qwen3"
    model.save_pretrained(str(d))
    return model, d


def _load_ours(d):
    with open(d / "config.json") as f:
        cfg = LLMConfig.from_hf_config(json.load(f))
    params = load_hf_weights(str(d), cfg, dtype=jnp.float32)
    return LLM(cfg, dtype=jnp.float32), params


@pytest.mark.slow
def test_qwen3_config_mapping(tmp_path):
    _, d = _tiny_hf_qwen3(tmp_path)
    with open(d / "config.json") as f:
        cfg = LLMConfig.from_hf_config(json.load(f))
    assert cfg.qk_norm
    assert not cfg.sandwich_norms and not cfg.rms_norm_unit_offset
    assert cfg.attn_logit_softcap is None and cfg.sliding_window is None
    assert not cfg.attention_bias
    # qwen2 keeps its bias default; qwen3 dropped it
    assert LLMConfig.from_hf_config(
        {"model_type": "qwen2", "vocab_size": 8, "hidden_size": 8,
         "intermediate_size": 16, "num_hidden_layers": 1,
         "num_attention_heads": 2}).attention_bias


@pytest.mark.slow
def test_qwen3_logit_parity_vs_hf(tmp_path):
    torch = pytest.importorskip("torch")
    hf, d = _tiny_hf_qwen3(tmp_path)
    llm, params = _load_ours(d)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 96, (2, 14)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits.float().numpy()
    logits, _, _ = llm(params, input_ids=jnp.asarray(ids),
                       attention_mask=jnp.ones_like(jnp.asarray(ids)))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_qwen3_greedy_decode_matches_hf(tmp_path):
    torch = pytest.importorskip("torch")
    hf, d = _tiny_hf_qwen3(tmp_path)
    llm, params = _load_ours(d)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 96, (2, 10)).astype(np.int32)
    T = 8
    with torch.no_grad():
        ref = hf.generate(torch.tensor(ids, dtype=torch.long),
                          max_new_tokens=T, do_sample=False).numpy()
    out, _ = llm.generate(params, jax.random.PRNGKey(0), jnp.asarray(ids),
                          jnp.ones_like(jnp.asarray(ids)),
                          max_new_tokens=T, do_sample=False, spec_tokens=0)
    np.testing.assert_array_equal(np.asarray(out), ref[:, ids.shape[1]:])


@pytest.mark.slow
def test_qwen3_export_round_trip(tmp_path):
    _, d = _tiny_hf_qwen3(tmp_path)
    llm, params = _load_ours(d)
    from llamole_tpu.models.gllm.convert import export_hf_weights, to_hf_config
    out_dir = tmp_path / "exported"
    export_hf_weights(params, llm.cfg, str(out_dir))
    assert to_hf_config(llm.cfg, params)["model_type"] == "qwen3"
    with open(out_dir / "config.json") as f:
        cfg2 = LLMConfig.from_hf_config(json.load(f))
    assert cfg2.qk_norm
    params2 = load_hf_weights(str(out_dir), cfg2, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 96, (1, 9)).astype(np.int32))
    a, _, _ = llm(params, input_ids=ids, attention_mask=jnp.ones_like(ids))
    b, _, _ = LLM(cfg2, dtype=jnp.float32)(params2, input_ids=ids,
                                           attention_mask=jnp.ones_like(ids))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)
