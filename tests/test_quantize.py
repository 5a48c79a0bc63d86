"""Int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.models.gllm import LLM, LLMConfig
from llamole_tpu.models.gllm.quantize import quantize_llm_params, quantized_bytes


@pytest.fixture(scope="module")
def models():
    cfg = LLMConfig.tiny(128)
    m = LLM(cfg, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0))
    qparams = quantize_llm_params(params)
    return m, params, qparams


def test_memory_shrinks(models):
    m, params, qparams = models
    assert quantized_bytes(qparams) < 0.5 * quantized_bytes(params)


def test_outputs_close(models):
    m, params, qparams = models
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    full, _, _ = m(params, input_ids=ids)
    quant, _, _ = m(qparams, input_ids=ids)
    pf = np.asarray(jax.nn.softmax(full[0, -1]))
    pq = np.asarray(jax.nn.softmax(quant[0, -1]))
    # next-token distributions nearly identical at int8
    assert np.abs(pf - pq).max() < 0.05
    assert int(pf.argmax()) == int(pq.argmax())


def test_generation_runs_quantized(models):
    m, params, qparams = models
    ids = jnp.asarray([[3, 1, 4, 1, 5]])
    toks, _ = m.generate(qparams, jax.random.PRNGKey(0), ids,
                         jnp.ones_like(ids), max_new_tokens=4,
                         do_sample=False)
    assert np.asarray(toks).shape == (1, 4)


# ---------------------------------------------------------------------------
# int4 (group-wise scales)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def models4(models):
    m, params, _ = models
    # group_size=32 exercises the grouped contraction (hidden 64 -> G=2,
    # down-proj in_dim 128 -> G=4); group_size=128 would collapse to G=1
    # at tiny shapes
    q4 = quantize_llm_params(params, bits=4, group_size=32)
    return m, params, q4


def test_int4_leaf_shapes_and_error_bound(models4):
    m, params, q4 = models4
    leaf = q4["layers"][0]["mlp"]["down"]
    w = np.asarray(params["layers"][0]["mlp"]["down"]["w"], np.float32)
    assert leaf["w_q4"].dtype == jnp.int4
    g, out = leaf["scale"].shape
    assert (g, out) == (4, w.shape[1])
    # dequantized weight within half a quantization step everywhere
    wq = np.asarray(leaf["w_q4"], np.float32).reshape(g, w.shape[0] // g, out)
    s = np.asarray(leaf["scale"], np.float32)
    dq = (wq * s[:, None, :]).reshape(w.shape)
    assert np.abs(w - dq).max() <= (s.max() / 2) + 1e-7


def test_int4_outputs_close(models4):
    m, params, q4 = models4
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    full, _, _ = m(params, input_ids=ids)
    quant, _, _ = m(q4, input_ids=ids)
    pf = np.asarray(jax.nn.softmax(full[0, -1]))
    pq = np.asarray(jax.nn.softmax(quant[0, -1]))
    # int4 is lossier than int8; distributions still track
    assert np.abs(pf - pq).max() < 0.15


def test_int4_grouped_matches_per_channel_dequant():
    """The grouped dot_general path must equal explicit dequant + matmul."""
    from llamole_tpu.models.gllm.model import _proj
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (64, 48), jnp.float32)
    from llamole_tpu.models.gllm.quantize import _quantize_leaf4
    leaf = _quantize_leaf4({"w": w}, group_size=16)   # G=4
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 64), jnp.float32)
    y = _proj(leaf, x)
    g, out = leaf["scale"].shape
    dq = (np.asarray(leaf["w_q4"], np.float32).reshape(g, 16, out)
          * np.asarray(leaf["scale"])[:, None, :]).reshape(64, out)
    ref = np.asarray(x, np.float32).reshape(-1, 64) @ dq
    np.testing.assert_allclose(np.asarray(y).reshape(-1, out), ref,
                               rtol=1e-5, atol=1e-5)


def test_int4_generation_runs(models4):
    m, params, q4 = models4
    ids = jnp.asarray([[3, 1, 4, 1, 5]])
    toks, _ = m.generate(q4, jax.random.PRNGKey(0), ids,
                         jnp.ones_like(ids), max_new_tokens=4,
                         do_sample=False)
    assert np.asarray(toks).shape == (1, 4)


def test_int4_init_params_quantized_stacked():
    from llamole_tpu.models.gllm.quantize import init_params_quantized
    from llamole_tpu.models.gllm.model import forward
    cfg = LLMConfig.tiny(128)
    cfg.scan_layers = True
    p4 = init_params_quantized(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32, bits=4, group_size=32)
    leaf = p4["layers_stacked"]["mlp"]["down"]
    assert leaf["w_q4"].dtype == jnp.int4
    assert leaf["scale"].shape == (cfg.num_layers, 4, cfg.hidden_size)
    ids = jnp.asarray([[3, 1, 4, 1]])
    logits, _, _ = forward(p4, cfg, input_ids=ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_quantize_bits_validation():
    with pytest.raises(ValueError):
        quantize_llm_params({}, bits=3)


# ---------------------------------------------------------------------------
# W8A8 (native int8 MXU: activations quantized per-token)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def models_a8(models):
    m, params, _ = models
    return m, params, quantize_llm_params(params, act_int8=True)


def test_w8a8_leaf_keys(models_a8):
    m, params, qa = models_a8
    leaf = qa["layers"][0]["attn"]["q"]
    assert "w_qa" in leaf and "w_q" not in leaf
    assert leaf["w_qa"].dtype == jnp.int8


def test_w8a8_outputs_close(models_a8):
    m, params, qa = models_a8
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    full, _, _ = m(params, input_ids=ids)
    quant, _, _ = m(qa, input_ids=ids)
    pf = np.asarray(jax.nn.softmax(full[0, -1]))
    pq = np.asarray(jax.nn.softmax(quant[0, -1]))
    # activation quant adds error over weight-only; distributions track
    assert np.abs(pf - pq).max() < 0.1


def test_w8a8_proj_matches_manual():
    """The w_qa branch must equal quantize-x + int matmul + rescale."""
    from llamole_tpu.models.gllm.model import _proj
    from llamole_tpu.models.gllm.quantize import _quantize_leaf, _relabel_a8
    key = jax.random.PRNGKey(5)
    w = jax.random.normal(key, (64, 48), jnp.float32)
    leaf = _relabel_a8(_quantize_leaf({"w": w}))
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 64), jnp.float32)
    y = _proj(leaf, x)
    xs = np.maximum(np.abs(np.asarray(x)).max(-1, keepdims=True), 1e-6) / 127.0
    x8 = np.clip(np.round(np.asarray(x) / xs), -127, 127)
    ref = (x8 @ np.asarray(leaf["w_qa"], np.float64)) * xs \
        * np.asarray(leaf["scale"])
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_w8a8_generation_runs(models_a8):
    m, params, qa = models_a8
    ids = jnp.asarray([[3, 1, 4, 1, 5]])
    toks, _ = m.generate(qa, jax.random.PRNGKey(0), ids,
                         jnp.ones_like(ids), max_new_tokens=4,
                         do_sample=False)
    assert np.asarray(toks).shape == (1, 4)


def test_w8a8_requires_bits8():
    with pytest.raises(ValueError):
        quantize_llm_params({}, bits=4, act_int8=True)
