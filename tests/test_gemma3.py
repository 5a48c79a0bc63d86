"""Gemma-3 (text) family support: logit parity against the actual HF
torch Gemma3ForCausalLM — unit-offset q/k norms, dual-frequency rope
(sliding layers at rope_local_base_freq, global layers at rope_theta
with linear scaling), 5:1-style modular local/global attention, sandwich
norms, GeGLU, embedding scaling, query_pre_attn_scalar, NO softcaps —
plus decode parity through the KV-cache path, scan-storage parity, and
converter round-trip. Reference analog: the base-LLM loading surface
(src/model/loader.py:148-220) — gemma3 is a beyond-reference family."""

import json

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from llamole_tpu.models.gllm import LLM, LLMConfig  # noqa: E402
from llamole_tpu.models.gllm.convert import load_hf_weights  # noqa: E402


def _tiny_hf_gemma3(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    cfg = Gemma3TextConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        # dual rope MUST be exercised: distinct bases, scaling on the
        # global table only
        rope_theta=50000.0, rope_local_base_freq=10000.0,
        rope_scaling={"rope_type": "linear", "factor": 2.0},
        # deliberately != head_dim so the query scale is actually tested
        query_pre_attn_scalar=24.0,
        # window < test seq len so the local layers really clip; pattern
        # 3 mixes local (0, 1, 3) and global (2) layers in 4 layers
        sliding_window=8, sliding_window_pattern=3,
        hidden_activation="gelu_pytorch_tanh", attention_bias=False,
        tie_word_embeddings=True, attn_implementation="eager")
    torch.manual_seed(0)
    model = Gemma3ForCausalLM(cfg).eval()
    d = tmp_path / "hf_gemma3"
    model.save_pretrained(str(d))
    return model, d


def _load_ours(d, dtype=None):
    dtype = dtype or jnp.float32
    with open(d / "config.json") as f:
        cfg = LLMConfig.from_hf_config(json.load(f))
    params = load_hf_weights(str(d), cfg, dtype=dtype)
    return LLM(cfg, dtype=dtype), params


@pytest.mark.slow
def test_gemma3_config_mapping(tmp_path):
    _, d = _tiny_hf_gemma3(tmp_path)
    with open(d / "config.json") as f:
        raw = json.load(f)
        cfg = LLMConfig.from_hf_config(raw)
    assert cfg.sandwich_norms and cfg.rms_norm_unit_offset
    assert cfg.scale_embeddings and cfg.tie_word_embeddings
    assert cfg.hidden_act == "gelu_tanh"
    assert cfg.qk_norm
    assert cfg.attn_logit_softcap is None
    assert cfg.final_logit_softcap is None
    assert cfg.query_scale == 24.0
    assert cfg.sliding_window == 8
    assert cfg.rope_local_base_freq == 10000.0
    assert cfg.rope_scaling == "linear" and cfg.rope_scaling_factor == 2.0
    # pattern 3: layers 0, 1 local; 2 global; 3 local (derived from the
    # HF layer_types list when sliding_window_pattern is absent)
    assert cfg.sliding_window_pattern == 3
    flags = [cfg.is_global_layer(i) for i in range(4)]
    assert flags == [False, False, True, False]


def test_gemma3_irregular_layer_types_rejected():
    from llamole_tpu.models.gllm.config import _pattern_from_layer_types
    with pytest.raises(ValueError, match="irregular"):
        _pattern_from_layer_types(
            ["full_attention", "sliding_attention", "full_attention"], 3)
    assert _pattern_from_layer_types(None, 4) == 6
    assert _pattern_from_layer_types(
        ["sliding_attention"] * 4, 4) == 5  # all-sliding: never global


def test_gemma3_multimodal_config_descends_to_text():
    raw = {
        "model_type": "gemma3",
        "text_config": {
            "vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 8,
            "sliding_window": 16, "rope_local_base_freq": 10000.0,
        },
    }
    cfg = LLMConfig.from_hf_config(raw)
    assert cfg.qk_norm and cfg.sandwich_norms and cfg.sliding_window == 16


@pytest.mark.slow
def test_gemma3_logit_parity_vs_hf(tmp_path):
    torch = pytest.importorskip("torch")
    hf, d = _tiny_hf_gemma3(tmp_path)
    llm, params = _load_ours(d)

    rng = np.random.default_rng(1)
    # seq 16 > window 8: local layers actually clip history
    ids = rng.integers(1, 96, (2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits.float().numpy()
    logits, _, _ = llm(params, input_ids=jnp.asarray(ids),
                       attention_mask=jnp.ones_like(jnp.asarray(ids)))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_gemma3_greedy_decode_matches_hf(tmp_path):
    """Cache-path parity: the while_loop decode (with the sliding-window
    cache mask AND the per-layer rope tables) must emit the same greedy
    tokens as HF generate."""
    torch = pytest.importorskip("torch")
    hf, d = _tiny_hf_gemma3(tmp_path)
    llm, params = _load_ours(d)

    rng = np.random.default_rng(2)
    ids = rng.integers(1, 96, (2, 12)).astype(np.int32)
    T = 10
    with torch.no_grad():
        ref = hf.generate(torch.tensor(ids, dtype=torch.long),
                          max_new_tokens=T, do_sample=False).numpy()
    ref_new = ref[:, ids.shape[1]:]
    out, _ = llm.generate(params, jax.random.PRNGKey(0),
                          jnp.asarray(ids),
                          jnp.ones_like(jnp.asarray(ids)),
                          max_new_tokens=T, do_sample=False)
    np.testing.assert_array_equal(np.asarray(out), ref_new)


@pytest.mark.slow
def test_gemma3_scan_storage_parity(tmp_path):
    """Stacked (scan-over-layers) storage must reproduce the per-layer
    loop exactly — the dual rope table rides the scan via the same
    traced per-layer flag as the local/global mask."""
    _, d = _tiny_hf_gemma3(tmp_path)
    llm, params = _load_ours(d)
    from llamole_tpu.models.gllm.stacked import stack_layers
    stacked = stack_layers(params)

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 96, (2, 16)).astype(np.int32))
    mask = jnp.ones_like(ids)
    base, _, _ = llm(params, input_ids=ids, attention_mask=mask)
    scan, _, _ = llm(stacked, input_ids=ids, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(base), np.asarray(scan),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_gemma3_export_round_trip(tmp_path):
    """export_hf_weights(load_hf_weights(x)) reproduces the logits — the
    gemma3 q/k-norm names and dual-rope config survive the round trip."""
    _, d = _tiny_hf_gemma3(tmp_path)
    llm, params = _load_ours(d)
    from llamole_tpu.models.gllm.convert import export_hf_weights, to_hf_config
    out_dir = tmp_path / "exported"
    export_hf_weights(params, llm.cfg, str(out_dir))
    raw = to_hf_config(llm.cfg, params)
    assert raw["model_type"] == "gemma3_text"
    assert raw["rope_local_base_freq"] == 10000.0
    assert "attn_logit_softcapping" not in raw
    with open(out_dir / "config.json") as f:
        cfg2 = LLMConfig.from_hf_config(json.load(f))
    assert cfg2.qk_norm and cfg2.rope_local_base_freq == 10000.0
    assert cfg2.sliding_window_pattern == 3
    params2 = load_hf_weights(str(out_dir), cfg2, dtype=jnp.float32)

    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(1, 96, (1, 10)).astype(np.int32))
    a, _, _ = llm(params, input_ids=ids, attention_mask=jnp.ones_like(ids))
    b, _, _ = LLM(cfg2, dtype=jnp.float32)(params2, input_ids=ids,
                                           attention_mask=jnp.ones_like(ids))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)
