"""Slot-based continuous decoding: per-request token parity with
generate()'s scan path, staggered admission, slot reuse, stop-token
and budget retirement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.models.gllm import LLM, LLMConfig
from llamole_tpu.models.gllm.continuous import SlotDecoder, _bucket


@pytest.fixture(scope="module")
def tiny():
    cfg = LLMConfig.tiny(97)
    llm = LLM(cfg, dtype=jnp.float32)
    params = llm.init(jax.random.PRNGKey(0))
    return llm, params


def _reference_tokens(llm, params, prompt, *, max_new, eos_ids):
    """Full [max_new] greedy row from generate() (pads after stop).
    Comparisons pad the slot decoder's variable-length output to the
    same shape — token id 0 is a REAL vocab token, so stripping pads
    would be ambiguous (caught by the schedule fuzz)."""
    ids = jnp.asarray(np.asarray(prompt, np.int32)[None, :])
    out, _ = llm.generate(params, jax.random.PRNGKey(0), ids,
                          jnp.ones_like(ids), max_new_tokens=max_new,
                          do_sample=False, eos_ids=eos_ids, pad_id=0,
                          spec_tokens=0)
    return np.asarray(out)[0]


def _padded(got, max_new):
    full = np.zeros((max_new,), np.int32)
    full[:len(got)] = got
    return full


def test_bucket_selection():
    assert _bucket(3, (8, 16)) == 8
    assert _bucket(8, (8, 16)) == 8
    assert _bucket(9, (8, 16)) == 16
    with pytest.raises(ValueError, match="exceeds"):
        _bucket(17, (8, 16))


def test_greedy_parity_with_generate(tiny):
    """Every request decoded through the slot pool must emit exactly
    the tokens generate() emits for the same prompt — including stops
    on eos and budget exhaustion — regardless of admission order or
    co-resident slot-mates."""
    llm, params = tiny
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 97, size=n).tolist()
               for n in (3, 7, 5, 11, 4)]
    eos = (9, 23)
    dec = SlotDecoder(llm, params, slots=2, cache_len=64, max_new_tokens=10,
                      eos_ids=eos, pad_id=0, do_sample=False,
                      chunk_steps=3, prompt_buckets=(8, 16))
    rids = [dec.submit(p) for p in prompts]
    results = dec.drain()
    assert set(results) == set(rids)
    for rid, prompt in zip(rids, prompts):
        ref = _reference_tokens(llm, params, prompt, max_new=10,
                                eos_ids=eos)
        got, trig = results[rid]
        np.testing.assert_array_equal(_padded(got, 10), ref)
        if trig != -1:
            assert trig in eos


def test_staggered_admission_does_not_change_outputs(tiny):
    """A request admitted mid-flight decodes the same tokens as one
    admitted into an empty pool (slot isolation)."""
    llm, params = tiny
    rng = np.random.default_rng(1)
    a = rng.integers(1, 97, size=6).tolist()
    b = rng.integers(1, 97, size=4).tolist()

    dec = SlotDecoder(llm, params, slots=2, cache_len=64, max_new_tokens=8,
                      eos_ids=(), pad_id=0, do_sample=False,
                      chunk_steps=2, prompt_buckets=(8,))
    ra = dec.submit(a)
    dec.step()          # a is mid-decode
    rb = dec.submit(b)  # b joins a running pool
    results = dec.drain()

    solo = SlotDecoder(llm, params, slots=2, cache_len=64, max_new_tokens=8,
                       eos_ids=(), pad_id=0, do_sample=False,
                       chunk_steps=2, prompt_buckets=(8,))
    rb2 = solo.submit(b)
    expected_b = solo.drain()[rb2][0]
    np.testing.assert_array_equal(results[rb][0], expected_b)
    np.testing.assert_array_equal(
        _padded(results[ra][0], 8),
        _reference_tokens(llm, params, a, max_new=8, eos_ids=()))


def test_slot_reuse_and_throughput_counters(tiny):
    """More requests than slots: retirement frees slots for the queue
    and every request completes."""
    llm, params = tiny
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, 97, size=rng.integers(2, 8)).tolist()
               for _ in range(7)]
    dec = SlotDecoder(llm, params, slots=2, cache_len=32, max_new_tokens=5,
                      eos_ids=(), pad_id=0, do_sample=False,
                      chunk_steps=5, prompt_buckets=(8,))
    rids = [dec.submit(p) for p in prompts]
    results = dec.drain()
    assert set(results) == set(rids)
    assert all(len(results[r][0]) == 5 for r in rids)
    assert dec.idle and dec.chunks_run >= 4  # 7 reqs / 2 slots, 5 toks


def test_int8_kv_slot_parity(tiny):
    """int8 KV cache through the slot pool: the staged prefill scatters
    int8 values + scale planes verbatim, and per-step quantization sees
    the same inputs as generate() — greedy tokens must match exactly."""
    llm_f32, params = tiny
    cfg = LLMConfig.tiny(97)
    cfg.kv_cache_dtype = "int8"
    llm = LLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, 97, size=n).tolist() for n in (3, 6, 9)]
    dec = SlotDecoder(llm, params, slots=2, cache_len=32, max_new_tokens=6,
                      eos_ids=(9,), pad_id=0, do_sample=False,
                      chunk_steps=2, prompt_buckets=(16,))
    rids = [dec.submit(p) for p in prompts]
    results = dec.drain()
    for rid, prompt in zip(rids, prompts):
        ref = _reference_tokens(llm, params, prompt, max_new=6,
                                eos_ids=(9,))
        np.testing.assert_array_equal(_padded(results[rid][0], 6), ref)


def test_tp_sharded_slot_decode_parity(tiny):
    """Continuous serving composes with tensor parallelism: a SlotDecoder
    over tp-sharded params (the v5e-8 production serving shape) emits
    the same greedy tokens as the single-device pool."""
    from jax.sharding import Mesh
    from llamole_tpu.parallel.sharding import llm_param_pspecs, shard_params

    # vocab must divide tp=4 for the vocab-sharded embedding
    cfg = LLMConfig.tiny(128)
    llm = LLM(cfg, dtype=jnp.float32)
    params = llm.init(jax.random.PRNGKey(1))
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "tp"))
    sharded = shard_params(params, mesh, llm_param_pspecs(params))

    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (3, 6)]

    def run(p):
        dec = SlotDecoder(llm, p, slots=2, cache_len=32, max_new_tokens=6,
                          eos_ids=(9,), pad_id=0, do_sample=False,
                          chunk_steps=3, prompt_buckets=(8,))
        rids = [dec.submit(x) for x in prompts]
        out = dec.drain()
        return [out[r][0] for r in rids]

    base = run(params)
    with jax.set_mesh(mesh):
        shard = run(sharded)
    for a, b in zip(base, shard):
        np.testing.assert_array_equal(a, b)


def test_shared_prefix_parity_and_fallback(tiny):
    """Prefix-cached admissions emit exactly the tokens of the
    full-prompt path: prefix KV rows prefill once, suffix-only prefill
    attends over them; prompts NOT starting with the prefix fall back
    transparently."""
    llm, params = tiny
    rng = np.random.default_rng(9)
    prefix = rng.integers(1, 97, size=6).tolist()
    suffixes = [rng.integers(1, 97, size=n).tolist() for n in (3, 5, 2)]
    prompts = [prefix + s for s in suffixes]
    other = rng.integers(1, 97, size=7).tolist()   # no prefix match
    eos = (9,)

    dec = SlotDecoder(llm, params, slots=2, cache_len=64, max_new_tokens=8,
                      eos_ids=eos, pad_id=0, do_sample=False,
                      chunk_steps=3, prompt_buckets=(8,),
                      shared_prefix=prefix)
    rids = [dec.submit(p) for p in prompts] + [dec.submit(other)]
    results = dec.drain()
    for rid, prompt in zip(rids, prompts + [other]):
        ref = _reference_tokens(llm, params, prompt, max_new=8,
                                eos_ids=eos)
        np.testing.assert_array_equal(_padded(results[rid][0], 8), ref)

    # prompt == prefix exactly: one token short of a suffix -> full path
    rid = dec.submit(list(prefix))
    out = dec.drain()[rid][0]
    np.testing.assert_array_equal(
        _padded(out, 8), _reference_tokens(llm, params, prefix, max_new=8,
                                           eos_ids=eos))


def test_sliding_window_slot_parity(tiny):
    """gemma-style sliding windows through the slot pool: per-row cache
    offsets exercise the [B,S,T] local-mask branch; left-padding shifts
    slots and positions uniformly, so slot distance == positional
    distance and tokens match generate() exactly."""
    _, params = tiny
    cfg = LLMConfig.tiny(97)
    cfg.sliding_window = 4   # << decode horizon: the window really clips
    llm = LLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 97, size=n).tolist() for n in (3, 7, 5)]
    dec = SlotDecoder(llm, params, slots=2, cache_len=32, max_new_tokens=8,
                      eos_ids=(9,), pad_id=0, do_sample=False,
                      chunk_steps=3, prompt_buckets=(8,))
    rids = [dec.submit(p) for p in prompts]
    results = dec.drain()
    for rid, prompt in zip(rids, prompts):
        ref = _reference_tokens(llm, params, prompt, max_new=8,
                                eos_ids=(9,))
        np.testing.assert_array_equal(_padded(results[rid][0], 8), ref)


def test_shared_prefix_rejects_sliding_window(tiny):
    _, params = tiny
    cfg = LLMConfig.tiny(97)
    cfg.sliding_window = 8
    with pytest.raises(ValueError, match="sliding-window"):
        SlotDecoder(LLM(cfg, dtype=jnp.float32), params, slots=2,
                    cache_len=64, max_new_tokens=8,
                    prompt_buckets=(8,), shared_prefix=[1, 2, 3])


@pytest.mark.slow
def test_fuzz_random_schedules_match_generate(tiny):
    """Property test: under RANDOM pool sizes, chunk lengths, prompt
    lengths, interleaved submission schedules, and prefix reuse, every
    request's greedy tokens match generate() exactly."""
    llm, params = tiny
    rng = np.random.default_rng(42)
    eos = (9, 23, 41)
    for trial in range(4):
        slots = int(rng.integers(1, 4))
        chunk = int(rng.integers(1, 6))
        max_new = int(rng.integers(3, 9))
        prefix = (rng.integers(1, 97, size=int(rng.integers(2, 6))).tolist()
                  if trial % 2 else None)
        dec = SlotDecoder(llm, params, slots=slots, cache_len=64,
                          max_new_tokens=max_new, eos_ids=eos, pad_id=0,
                          do_sample=False, chunk_steps=chunk,
                          prompt_buckets=(8, 16), shared_prefix=prefix)
        prompts, rids = [], []
        results = {}
        # interleave submissions with pool steps (keeping their results)
        for _ in range(int(rng.integers(3, 7))):
            body = rng.integers(1, 97,
                                size=int(rng.integers(1, 10))).tolist()
            p = (list(prefix) + body) if (prefix and rng.random() < 0.6) \
                else body
            prompts.append(p)
            rids.append(dec.submit(p))
            if rng.random() < 0.5:
                for r, t, tr in dec.step():
                    results[r] = (t, tr)
        results.update(dec.drain())
        for rid, prompt in zip(rids, prompts):
            ref = _reference_tokens(llm, params, prompt,
                                    max_new=max_new, eos_ids=eos)
            np.testing.assert_array_equal(
                _padded(results[rid][0], max_new), ref,
                err_msg=f"trial={trial} slots={slots} chunk={chunk} "
                        f"max_new={max_new} prompt={prompt}")


def test_oversized_prompt_rejected_without_slot_leak(tiny):
    """submit() refuses prompts beyond every bucket BEFORE a slot is
    claimed; the pool keeps serving afterwards (review finding: the
    old path popped the slot first and leaked it on the raise)."""
    llm, params = tiny
    dec = SlotDecoder(llm, params, slots=2, cache_len=32, max_new_tokens=4,
                      do_sample=False, chunk_steps=2, prompt_buckets=(8,))
    for _ in range(3):   # more rejects than slots: leak would exhaust
        with pytest.raises(ValueError, match="exceeds"):
            dec.submit(list(range(1, 20)))
    rid = dec.submit([1, 2, 3])
    results = dec.drain()
    assert len(results[rid][0]) == 4
    assert len(dec._free) == 2   # every slot back in the pool


def test_oracle_loss_survives_nan_label():
    """A NaN property label masks out instead of poisoning the batch
    loss (review finding)."""
    import jax
    import jax.numpy as jnp
    from llamole_tpu.models.oracle import PropertyOracle, PropertyOracleConfig

    oracle = PropertyOracle(PropertyOracleConfig(num_layer=2,
                                                 hidden_size=16))
    params = oracle.init(jax.random.PRNGKey(0))
    atoms = jnp.zeros((2, 8), jnp.int32)
    edges = jnp.zeros((2, 8, 8), jnp.int32)
    mask = jnp.ones((2, 8), bool)
    targets = np.full((2, 10), -200.0, np.float32)
    targets[0, 3] = 1.5          # one real label
    targets[1, 4] = np.nan       # one NaN label
    loss = oracle.loss(params, atoms, edges, mask, jnp.asarray(targets))
    assert bool(jnp.isfinite(loss))


def test_cache_len_guard(tiny):
    llm, params = tiny
    with pytest.raises(ValueError, match="cache_len"):
        SlotDecoder(llm, params, slots=2, cache_len=16, max_new_tokens=16,
                    prompt_buckets=(8,))
