"""Scan-over-layers (stacked parameter layout) tests: forward/LoRA/
generation equivalence with the list layout, TP sharding of stacked
leaves, remat gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.models.gllm import LLM, LLMConfig, init_lora
from llamole_tpu.models.gllm.model import forward, lm_loss
from llamole_tpu.models.gllm.stacked import is_stacked, stack_layers, unstack_layers
from llamole_tpu.parallel import create_mesh, llm_param_pspecs, shard_params


@pytest.fixture(scope="module")
def tiny():
    cfg = LLMConfig.tiny(128)
    m = LLM(cfg, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(0))
    return m, p, stack_layers(p)


IDS = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])


def test_forward_equivalence(tiny):
    m, p, ps = tiny
    assert is_stacked(ps) and not is_stacked(p)
    base, _, _ = m(p, input_ids=IDS)
    stk, _, _ = m(ps, input_ids=IDS)
    np.testing.assert_allclose(np.asarray(base), np.asarray(stk),
                               atol=1e-5, rtol=1e-5)
    back = unstack_layers(ps)
    rt, _, _ = m(back, input_ids=IDS)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(rt))


def test_lora_equivalence(tiny):
    m, p, ps = tiny
    lora = init_lora(jax.random.PRNGKey(1), m.cfg, rank=4)
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    wl, _, _ = m(p, input_ids=IDS, lora=lora, lora_scale=2.0)
    wls, _, _ = m(ps, input_ids=IDS, lora=stack_layers(lora), lora_scale=2.0)
    np.testing.assert_allclose(np.asarray(wl), np.asarray(wls),
                               atol=1e-5, rtol=1e-5)


def test_generation_equivalence(tiny):
    m, p, ps = tiny
    mask = jnp.ones_like(IDS)
    t1, _ = m.generate(p, jax.random.PRNGKey(0), IDS, mask,
                       max_new_tokens=5, do_sample=False)
    t2, _ = m.generate(ps, jax.random.PRNGKey(0), IDS, mask,
                       max_new_tokens=5, do_sample=False)
    assert (np.asarray(t1) == np.asarray(t2)).all()


def test_remat_grads_through_scan(tiny):
    m, p, ps = tiny
    cfg_r = dataclasses.replace(m.cfg, remat=True)

    def loss(pp):
        logits, _, _ = forward(pp, cfg_r, input_ids=IDS)
        return lm_loss(logits, IDS)

    g = jax.grad(loss)(ps)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_stacked_tp_sharding(tiny):
    m, p, ps = tiny
    mesh = create_mesh(dp=2, tp=4)
    sh = shard_params(ps, mesh, llm_param_pspecs(ps))
    ref, _, _ = m(p, input_ids=IDS)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda pp: forward(pp, m.cfg, input_ids=IDS)[0])(sh)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-4, rtol=2e-4)


def test_mismatched_lora_layout_converts(tiny):
    """A list-layout adapter with stacked params (and vice versa) must
    still apply — it was silently IGNORED before, making
    scan_layers + lora train an inert adapter."""
    m, p, ps = tiny
    lora = init_lora(jax.random.PRNGKey(1), m.cfg, rank=4)
    lora = jax.tree.map(lambda x: x + 0.02, lora)
    base, _, _ = m(ps, input_ids=IDS)
    list_on_stacked, _, _ = m(ps, input_ids=IDS, lora=lora, lora_scale=2.0)
    assert float(jnp.max(jnp.abs(list_on_stacked - base))) > 1e-3
    stacked_on_list, _, _ = m(p, input_ids=IDS, lora=stack_layers(lora),
                              lora_scale=2.0)
    expect, _, _ = m(p, input_ids=IDS, lora=lora, lora_scale=2.0)
    np.testing.assert_allclose(np.asarray(stacked_on_list),
                               np.asarray(expect), rtol=1e-5, atol=1e-5)
