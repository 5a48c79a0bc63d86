"""LLM core tests: forward invariants, KV-cache == full-forward,
LoRA overlay/merge, generation stop tokens, TP sharding on the
8-device CPU mesh (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.models.gllm import LLM, LLMConfig, init_lora, merge_lora
from llamole_tpu.models.gllm.model import forward, lm_loss
from llamole_tpu.parallel import create_mesh, llm_param_pspecs, shard_params


@pytest.fixture(scope="module")
def tiny():
    cfg = LLMConfig.tiny(vocab_size=128)
    model = LLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_forward_shapes(tiny):
    model, params = tiny
    ids = jnp.arange(10)[None, :] % 128
    logits, hidden, _ = model(params, input_ids=ids)
    assert logits.shape == (1, 10, 128)
    assert hidden.shape == (1, 10, model.cfg.hidden_size)
    assert logits.dtype == jnp.float32


def test_causality(tiny):
    """Changing a future token must not affect past logits."""
    model, params = tiny
    ids1 = jnp.asarray([[1, 2, 3, 4, 5]])
    ids2 = jnp.asarray([[1, 2, 3, 9, 9]])
    l1, _, _ = model(params, input_ids=ids1)
    l2, _, _ = model(params, input_ids=ids2)
    np.testing.assert_allclose(np.asarray(l1[:, :3]), np.asarray(l2[:, :3]),
                               atol=1e-5)
    assert np.abs(np.asarray(l1[:, 3:]) - np.asarray(l2[:, 3:])).max() > 1e-3


def test_left_padding_equivalence(tiny):
    """Left-padded prompt gives the same last-token logits as unpadded."""
    model, params = tiny
    ids = jnp.asarray([[5, 6, 7, 8]])
    mask = jnp.ones_like(ids)
    padded = jnp.asarray([[0, 0, 5, 6, 7, 8]])
    pmask = jnp.asarray([[0, 0, 1, 1, 1, 1]])
    l1, _, _ = model(params, input_ids=ids, attention_mask=mask)
    l2, _, _ = model(params, input_ids=padded, attention_mask=pmask)
    np.testing.assert_allclose(np.asarray(l1[:, -1]), np.asarray(l2[:, -1]),
                               atol=1e-4)


def test_kv_cache_matches_full_forward(tiny):
    """Greedy decode with cache == argmax chain of full re-forwards."""
    model, params = tiny
    prompt = jnp.asarray([[3, 1, 4, 1, 5]])
    mask = jnp.ones_like(prompt)
    toks, done = model.generate(
        params, jax.random.PRNGKey(0), prompt, mask,
        max_new_tokens=6, do_sample=False, eos_ids=(), pad_id=0)
    toks = np.asarray(toks)[0]

    seq = list(np.asarray(prompt)[0])
    for t in range(6):
        ids = jnp.asarray([seq])
        logits, _, _ = model(params, input_ids=ids)
        nxt = int(jnp.argmax(logits[0, -1]))
        assert nxt == toks[t], f"step {t}: cache={toks[t]} full={nxt}"
        seq.append(nxt)


def test_generate_stops_on_eos(tiny):
    model, params = tiny
    prompt = jnp.asarray([[3, 1, 4, 1, 5]])
    mask = jnp.ones_like(prompt)
    # make every token an eos -> immediately done, all pads
    toks, done = model.generate(
        params, jax.random.PRNGKey(0), prompt, mask,
        max_new_tokens=4, do_sample=False,
        eos_ids=tuple(range(128)), pad_id=99)
    assert bool(np.asarray(done)[0])
    assert (np.asarray(toks) == 99).all()


def test_generate_deterministic_under_key(tiny):
    model, params = tiny
    prompt = jnp.asarray([[3, 1, 4, 1, 5], [2, 7, 1, 8, 2]])
    mask = jnp.ones_like(prompt)
    a, _ = model.generate(params, jax.random.PRNGKey(5), prompt, mask,
                          max_new_tokens=5, temperature=1.0, top_p=0.9)
    b, _ = model.generate(params, jax.random.PRNGKey(5), prompt, mask,
                          max_new_tokens=5, temperature=1.0, top_p=0.9)
    assert (np.asarray(a) == np.asarray(b)).all()


def test_inputs_embeds_splice(tiny):
    """Multimodal path: generation accepts inputs_embeds
    (modeling_llamole.py:625-629)."""
    model, params = tiny
    prompt = jnp.asarray([[3, 1, 4, 1, 5]])
    mask = jnp.ones_like(prompt)
    emb = model.embed(params, prompt)
    t1, _ = model.generate(params, jax.random.PRNGKey(0), prompt, mask,
                           max_new_tokens=3, do_sample=False)
    t2, _ = model.generate(params, jax.random.PRNGKey(0), prompt, mask,
                           max_new_tokens=3, do_sample=False,
                           inputs_embeds=emb)
    assert (np.asarray(t1) == np.asarray(t2)).all()


def test_lora_overlay_and_merge(tiny):
    model, params = tiny
    lora = init_lora(jax.random.PRNGKey(1), model.cfg, rank=4)
    ids = jnp.asarray([[1, 2, 3]])
    base, _, _ = model(params, input_ids=ids)
    with_lora, _, _ = model(params, input_ids=ids, lora=lora, lora_scale=2.0)
    # B=0 init: adapter starts inert
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-5)
    # perturb B, overlay must change outputs and merged must match overlay
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    with_lora, _, _ = model(params, input_ids=ids, lora=lora, lora_scale=2.0)
    assert np.abs(np.asarray(base) - np.asarray(with_lora)).max() > 1e-4
    merged = merge_lora(params, lora, scale=2.0)
    l_m, _, _ = model(merged, input_ids=ids)
    np.testing.assert_allclose(np.asarray(with_lora), np.asarray(l_m),
                               atol=1e-3, rtol=1e-3)


def test_lm_loss_masking():
    logits = jnp.zeros((1, 4, 10))
    labels = jnp.asarray([[-100, 2, -100, 3]])
    loss = lm_loss(logits, labels)
    np.testing.assert_allclose(float(loss), np.log(10.0), rtol=1e-5)


def test_tp_sharded_forward_matches_single(tiny):
    """Forward under a dp2 x tp4 mesh == single-device forward."""
    model, params = tiny
    mesh = create_mesh(dp=2, tp=4)
    pspecs = llm_param_pspecs(params)
    sharded = shard_params(params, mesh, pspecs)
    ids = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]])
    ref, _, _ = model(params, input_ids=ids)

    from jax.sharding import NamedSharding, PartitionSpec as P
    with jax.set_mesh(mesh):
        ids_sh = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
        out, _, _ = jax.jit(
            lambda p, i: forward(p, model.cfg, input_ids=i))(sharded, ids_sh)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-4, rtol=2e-4)


def test_generate_return_trigger():
    """return_trigger reports WHICH stop token fired per row
    (reference-style interleaved trigger dispatch,
    modeling_llamole.py:1196-1284)."""
    import jax
    import jax.numpy as jnp

    from llamole_tpu.models.gllm import LLM, LLMConfig

    cfg = LLMConfig.tiny(64)
    m = LLM(cfg, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0))
    ids = jnp.asarray([[3, 1, 4, 1, 5], [9, 2, 6, 5, 3]])
    mask = jnp.ones_like(ids)
    # greedy with EVERY token a stop token -> stops at step 1, trigger set
    toks, done, trig = m.generate(
        params, jax.random.PRNGKey(0), ids, mask, max_new_tokens=4,
        do_sample=False, eos_ids=tuple(range(64)), pad_id=0,
        return_trigger=True)
    assert bool(done.all())
    t = np.asarray(trig)
    assert (t >= 0).all() and (t < 64).all()
    # stopped rows emit pad everywhere
    assert (np.asarray(toks) == 0).all()
    # no stop tokens -> trigger stays -1
    toks2, done2, trig2 = m.generate(
        params, jax.random.PRNGKey(0), ids, mask, max_new_tokens=4,
        do_sample=False, eos_ids=(), pad_id=0, return_trigger=True)
    assert not bool(done2.any())
    assert (np.asarray(trig2) == -1).all()


def test_int8_kv_cache_generation():
    """int8 KV cache: generation runs, cache leaves are int8, and greedy
    decode matches the bf16-cache output on a tiny model."""
    import jax
    import jax.numpy as jnp

    from llamole_tpu.models.gllm import LLM, LLMConfig

    cfg = LLMConfig.tiny(64)
    m = LLM(cfg, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0))
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    mask = jnp.ones_like(ids)

    toks_full, _ = m.generate(params, jax.random.PRNGKey(0), ids, mask,
                              max_new_tokens=6, do_sample=False, pad_id=0)

    cfg8 = LLMConfig.tiny(64)
    cfg8.kv_cache_dtype = "int8"
    m8 = LLM(cfg8, dtype=jnp.float32)
    toks_int8, _ = m8.generate(params, jax.random.PRNGKey(0), ids, mask,
                               max_new_tokens=6, do_sample=False, pad_id=0)
    # per-(token,head) int8 quantization is ~0.4% error; greedy paths on
    # a random tiny model agree
    assert (np.asarray(toks_full) == np.asarray(toks_int8)).all(), (
        toks_full, toks_int8)


def test_int8_kv_cache_logit_fidelity():
    """Single-step decode logits with an int8 cache stay close to the
    full-precision cache logits."""
    import jax
    import jax.numpy as jnp

    from llamole_tpu.models.gllm import LLM, LLMConfig
    from llamole_tpu.models.gllm.model import forward

    cfg = LLMConfig.tiny(64)
    m = LLM(cfg, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0))
    b, p, total = 1, 8, 12
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    mask = jnp.ones_like(ids)
    hd = cfg.head_dim_

    def run(int8):
        entry = {"k": jnp.zeros((cfg.num_layers, b, total, cfg.num_kv_heads,
                                 hd), jnp.int8 if int8 else jnp.float32),
                 "v": jnp.zeros((cfg.num_layers, b, total, cfg.num_kv_heads,
                                 hd), jnp.int8 if int8 else jnp.float32)}
        if int8:
            entry["k_scale"] = jnp.zeros(
                (cfg.num_layers, b, total, cfg.num_kv_heads), jnp.float32)
            entry["v_scale"] = jnp.zeros(
                (cfg.num_layers, b, total, cfg.num_kv_heads), jnp.float32)
        from llamole_tpu.models.gllm.stacked import stack_layers
        sp = stack_layers(params)
        kv_valid = jnp.concatenate(
            [mask > 0, jnp.zeros((b, total - p), bool)], axis=1)
        logits, _, cache = forward(
            sp, cfg, input_ids=ids, attention_mask=mask,
            kv_cache=entry, cache_index=jnp.asarray(0), kv_valid=kv_valid)
        return np.asarray(logits[:, -1]), cache

    full, _ = run(False)
    quant, cache = run(True)
    assert cache["k"].dtype == jnp.int8
    denom = np.abs(full).max() + 1e-9
    assert np.abs(full - quant).max() / denom < 0.02, (
        np.abs(full - quant).max(), denom)


def test_generate_under_tp_mesh(tiny):
    """Greedy decode with tp-sharded params (cache + sampling under
    GSPMD) must match the unsharded output exactly in f32."""
    model, params = tiny
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    mask = jnp.ones_like(ids)
    kw = dict(max_new_tokens=10, do_sample=False, temperature=0.0, pad_id=0)
    base, _ = model.generate(params, jax.random.PRNGKey(0), ids, mask, **kw)
    mesh = create_mesh(tp=2)
    sharded = shard_params(params, mesh, llm_param_pspecs(params))
    with jax.set_mesh(mesh):
        out, _ = model.generate(sharded, jax.random.PRNGKey(0), ids, mask,
                                **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
