"""LongLoRA S²-attn (shift short attention) — SURVEY §5 long-context row
(reference model_utils/longlora.py:51-346, training-only)."""

import jax
import jax.numpy as jnp
import numpy as np

from llamole_tpu.models.gllm import LLM, LLMConfig
from llamole_tpu.models.gllm.model import _attention, _s2_attention, forward


def test_s2_equals_full_attention_within_first_group():
    """Tokens in the first group of the UNSHIFTED heads see exactly the
    same keys as full causal attention — their outputs must match."""
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 16, 4, 8
    group = 4
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask1 = jnp.ones((b, s), jnp.int32)

    causal = jnp.tril(jnp.ones((s, s), bool))[None]
    full = _attention(q, k, v, causal).reshape(b, s, h, d)
    s2 = _s2_attention(q, k, v, mask1, group).reshape(b, s, h, d)
    # unshifted heads (first half), first group: identical to full attn
    np.testing.assert_allclose(
        np.asarray(s2[:, :group, : h // 2]),
        np.asarray(full[:, :group, : h // 2]), rtol=2e-5, atol=2e-5)
    # but later tokens differ (group locality) — it's NOT full attention
    assert float(jnp.max(jnp.abs(s2[:, group:] - full[:, group:]))) > 1e-3


def test_s2_attention_is_causal_within_groups():
    """Changing a future token inside the same group must not affect
    earlier outputs; changing the first token affects its group."""
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 16, 4, 8
    group = 4
    mk = lambda a: jnp.asarray(a.astype(np.float32))
    q = mk(rng.normal(size=(b, s, h, d)))
    k = mk(rng.normal(size=(b, s, h, d)))
    v = mk(rng.normal(size=(b, s, h, d)))
    mask = jnp.ones((b, s), jnp.int32)
    base = _s2_attention(q, k, v, mask, group)
    k2 = k.at[:, 3].add(10.0)  # last token of group 0
    v2 = v.at[:, 3].add(10.0)
    pert = _s2_attention(q, k2, v2, mask, group)
    # outputs at positions 0-2 (unshifted heads) unchanged
    unshifted = slice(0, (h // 2) * d)
    np.testing.assert_allclose(np.asarray(base[:, :3, unshifted]),
                               np.asarray(pert[:, :3, unshifted]),
                               rtol=1e-5, atol=1e-5)
    assert float(jnp.max(jnp.abs(base[:, 3] - pert[:, 3]))) > 1e-3


def test_forward_uses_s2_only_in_training():
    cfg = LLMConfig.tiny(128)
    cfg.shift_attn = True
    cfg.group_size_ratio = 0.25
    m = LLM(cfg, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0))
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3]])

    logits_train, _, _ = forward(params, cfg, input_ids=ids, train=True)
    logits_eval, _, _ = forward(params, cfg, input_ids=ids, train=False)
    # grouped attention changes logits (shifted heads wrap around the
    # sequence, longlora roll semantics); eval path stays full attention
    assert float(jnp.max(jnp.abs(logits_train - logits_eval))) > 1e-4
    assert np.isfinite(np.asarray(logits_train)).all()
    # with shift_attn off, train and eval paths are identical
    cfg2 = LLMConfig.tiny(128)
    m2 = LLM(cfg2, dtype=jnp.float32)
    lt, _, _ = forward(params, cfg2, input_ids=ids, train=True)
    le, _, _ = forward(params, cfg2, input_ids=ids, train=False)
    np.testing.assert_allclose(np.asarray(lt), np.asarray(le))
    # gradient flows through the S² path
    def loss(p):
        lg, _, _ = forward(p, cfg, input_ids=ids, train=True)
        return jnp.sum(lg ** 2)
    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_s2_gqa_head_expansion():
    """kv heads expand to query heads before the shift (longlora repeat_kv
    then shift order)."""
    rng = np.random.default_rng(2)
    b, s, h, kv, d = 1, 8, 4, 2, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, kv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, kv, d)).astype(np.float32))
    out = _s2_attention(q, k, v, jnp.ones((b, s), jnp.int32), 4)
    assert out.shape == (b, s, h * d)
    assert np.isfinite(np.asarray(out)).all()


def test_s2_respects_padding_on_shifted_heads():
    """Padded keys must stay masked for BOTH head halves: the shifted
    half's validity mask rolls with the keys (review finding: a shared
    unrolled mask let shifted heads attend pad tokens)."""
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 16, 4, 8
    group = 4
    mk = lambda a: jnp.asarray(a.astype(np.float32))
    q = mk(rng.normal(size=(b, s, h, d)))
    k = mk(rng.normal(size=(b, s, h, d)))
    v = mk(rng.normal(size=(b, s, h, d)))
    mask = jnp.ones((b, s), jnp.int32).at[:, -4:].set(0)  # trailing pad

    base = _s2_attention(q, k, v, mask, group)
    # poison the padded positions' k/v: outputs at VALID positions must
    # not change (pad-query rows are garbage by design and discarded)
    k2 = k.at[:, -4:].set(1e4)
    v2 = v.at[:, -4:].set(1e4)
    pert = _s2_attention(q, k2, v2, mask, group)
    valid = s - 4
    np.testing.assert_allclose(np.asarray(base[:, :valid]),
                               np.asarray(pert[:, :valid]),
                               rtol=1e-5, atol=1e-5)
