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
