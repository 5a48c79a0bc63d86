"""Prompt-lookup speculative decoding tests.

The speculative path (gllm/model.py _speculative_loop) must be
distribution-exact vs the per-token scan: greedy decode must match
token-for-token (delta-draft acceptance is deterministic there), and
sampled decode must match in per-position marginals (delta-draft
rejection sampling preserves the warped target distribution exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.models.gllm import LLM, LLMConfig


@pytest.fixture(scope="module")
def tiny():
    cfg = LLMConfig.tiny(vocab_size=96)
    model = LLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _prompt(b=3, p=9, vocab=96, left_pad=True):
    rng = np.random.RandomState(0)
    ids = rng.randint(2, vocab, size=(b, p)).astype(np.int32)
    mask = np.ones((b, p), np.int32)
    if left_pad:
        # ragged left-padding
        for i, n_pad in enumerate([0, 3, 5][:b]):
            ids[i, :n_pad] = 0
            mask[i, :n_pad] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


@pytest.mark.parametrize("spec,ngram", [(1, 1), (3, 2), (4, 3)])
def test_greedy_matches_scan(tiny, spec, ngram):
    model, params = tiny
    ids, mask = _prompt()
    kw = dict(max_new_tokens=24, do_sample=False, temperature=0.0,
              pad_id=0, return_trigger=True)
    base, base_done, base_trig = model.generate(
        params, jax.random.PRNGKey(1), ids, mask, spec_tokens=0, **kw)
    out, done, trig = model.generate(
        params, jax.random.PRNGKey(1), ids, mask,
        spec_tokens=spec, spec_ngram=ngram, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(base_done), np.asarray(done))
    np.testing.assert_array_equal(np.asarray(base_trig), np.asarray(trig))


def test_greedy_matches_scan_with_eos(tiny):
    """Stop tokens: pick ids the greedy continuation actually emits, so
    both paths must stop at the same position with the same trigger."""
    model, params = tiny
    ids, mask = _prompt()
    base, _ = model.generate(params, jax.random.PRNGKey(1), ids, mask,
                             max_new_tokens=24, do_sample=False,
                             temperature=0.0, pad_id=0, spec_tokens=0)
    base = np.asarray(base)
    eos = (int(base[0, 10]), int(base[1, 5]))
    kw = dict(max_new_tokens=24, do_sample=False, temperature=0.0,
              pad_id=0, eos_ids=eos, return_trigger=True)
    b_out, b_done, b_trig = model.generate(
        params, jax.random.PRNGKey(1), ids, mask, spec_tokens=0, **kw)
    s_out, s_done, s_trig = model.generate(
        params, jax.random.PRNGKey(1), ids, mask,
        spec_tokens=3, **kw)
    np.testing.assert_array_equal(np.asarray(b_out), np.asarray(s_out))
    np.testing.assert_array_equal(np.asarray(b_done), np.asarray(s_done))
    np.testing.assert_array_equal(np.asarray(b_trig), np.asarray(s_trig))
    assert bool(np.asarray(b_done).all())


def test_greedy_repetitive_prompt(tiny):
    """A periodic prompt makes n-gram lookup propose real continuations;
    exactness must hold when drafts are frequently accepted."""
    model, params = tiny
    pat = np.array([7, 11, 13, 17, 19, 23], np.int32)
    ids = jnp.asarray(np.tile(pat, 4)[None, :])
    mask = jnp.ones_like(ids)
    kw = dict(max_new_tokens=30, do_sample=False, temperature=0.0, pad_id=0)
    base, _ = model.generate(params, jax.random.PRNGKey(2), ids, mask,
                            spec_tokens=0, **kw)
    out, _ = model.generate(params, jax.random.PRNGKey(2), ids, mask,
                            spec_tokens=4, spec_ngram=2, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


@pytest.mark.parametrize("top_p,top_k", [(0.9, 0), (1.0, 8), (1.0, 0)])
def test_sampled_marginals_match(tiny, top_p, top_k):
    """Per-position empirical marginals of the speculative path must match
    the scan path (distribution exactness of delta-draft rejection
    sampling). 2048 parallel rows of the same prompt, TV-distance bound
    loose enough for sampling noise, tight enough to catch any real
    acceptance/residual bug (those shift mass by O(p_draft) ~ 0.3+)."""
    model, params = tiny
    n = 2048
    ids = jnp.tile(jnp.asarray([[5, 9, 33, 70]], jnp.int32), (n, 1))
    mask = jnp.ones_like(ids)
    kw = dict(max_new_tokens=4, do_sample=True, temperature=1.0,
              top_p=top_p, top_k=top_k, pad_id=0)
    base, _ = model.generate(params, jax.random.PRNGKey(3), ids, mask, **kw)
    base2, _ = model.generate(params, jax.random.PRNGKey(5), ids, mask, **kw)
    out, _ = model.generate(params, jax.random.PRNGKey(4), ids, mask,
                            spec_tokens=3, **kw)
    base, base2, out = np.asarray(base), np.asarray(base2), np.asarray(out)
    for pos in range(4):
        hb = np.bincount(base[:, pos], minlength=96) / n
        hb2 = np.bincount(base2[:, pos], minlength=96) / n
        hs = np.bincount(out[:, pos], minlength=96) / n
        tv = 0.5 * np.abs(hb - hs).sum()
        # calibrate against the scan path's own seed-to-seed noise floor
        tv_floor = 0.5 * np.abs(hb - hb2).sum()
        assert tv < 1.5 * tv_floor + 0.05, \
            f"pos {pos}: TV {tv:.3f} vs floor {tv_floor:.3f}"


def test_ngram_draft_proposer():
    """The proposer must return the continuation after the MOST RECENT
    match of the trailing n-gram, honoring validity masks."""
    from llamole_tpu.models.gllm.model import LLM as _LLM

    p, max_new = 8, 8
    L = p + max_new
    hist = np.zeros((2, L + 1), np.int32)
    hvalid = np.zeros((2, L + 1), bool)
    # row 0: prompt [5 6 9 5 6 7 2 3], generated [5 6] -> trailing bigram
    # (5,6); most recent earlier match at cols 3-4 -> drafts [7 2 3]
    hist[0, :p] = [5, 6, 9, 5, 6, 7, 2, 3]
    hvalid[0, :p] = True
    hist[0, p:p + 2] = [5, 6]
    hvalid[0, p:p + 2] = True
    # row 1: left-padded prompt (cols 0-2 invalid contain a fake match)
    hist[1, :p] = [4, 8, 0, 1, 4, 8, 4, 8]
    hvalid[1, 3:p] = True
    hist[1, p:p + 2] = [4, 8]
    hvalid[1, p:p + 2] = True
    gen = jnp.asarray([2, 2], jnp.int32)
    drafts = _LLM._ngram_drafts(jnp.asarray(hist), jnp.asarray(hvalid),
                                gen, p, L, 2, 3)
    drafts = np.asarray(drafts)
    np.testing.assert_array_equal(drafts[0], [7, 2, 3])
    # row 1: most recent valid (4,8) before the tail starts at col 6 ->
    # continuation is cols 8.. = the generated [4, 8] then junk col 10
    np.testing.assert_array_equal(drafts[1][:2], [4, 8])


def test_spec_accepts_on_cyclic_continuation(tiny):
    """When the model's greedy continuation is predictable from history
    (we seed the prompt with the model's own greedy continuation pattern),
    iterations must be well below one-per-token — guards against the
    proposer or acceptance silently never matching."""
    model, params = tiny
    ids0 = jnp.asarray(np.arange(5, 17, dtype=np.int32)[None, :])
    mask0 = jnp.ones_like(ids0)
    base, _ = model.generate(params, jax.random.PRNGKey(0), ids0, mask0,
                             max_new_tokens=16, do_sample=False,
                             temperature=0.0, pad_id=0)
    # prompt = original + greedy continuation + original again: the model
    # replays the same continuation, and lookup finds it in history
    ids = jnp.concatenate([ids0, jnp.asarray(base), ids0], axis=1)
    mask = jnp.ones_like(ids)
    out, done, iters = model.generate(
        params, jax.random.PRNGKey(0), ids, mask, max_new_tokens=16,
        do_sample=False, temperature=0.0, pad_id=0, spec_tokens=4,
        return_spec_iters=True)
    base2, _ = model.generate(params, jax.random.PRNGKey(0), ids, mask,
                              max_new_tokens=16, do_sample=False,
                              temperature=0.0, pad_id=0)
    np.testing.assert_array_equal(np.asarray(base2), np.asarray(out))
    assert int(iters) <= 12, f"no speculation benefit: {int(iters)} iters"


def test_spec_respects_max_new_tokens(tiny):
    model, params = tiny
    ids, mask = _prompt(b=2)
    out, done = model.generate(params, jax.random.PRNGKey(5), ids, mask,
                               max_new_tokens=7, do_sample=True,
                               temperature=0.8, pad_id=0, spec_tokens=4)
    assert out.shape == (2, 7)
    assert np.asarray(out).max() < 96
    assert np.asarray(out).min() >= 0


def test_spec_with_rep_penalty_falls_back(tiny):
    """repetition_penalty needs per-token seen-set updates, incompatible
    with multi-token acceptance — generate must use the scan path and
    still produce the scan path's exact output."""
    model, params = tiny
    ids, mask = _prompt(b=2)
    kw = dict(max_new_tokens=8, do_sample=False, temperature=0.0,
              pad_id=0, repetition_penalty=1.3)
    base, _ = model.generate(params, jax.random.PRNGKey(6), ids, mask,
                             spec_tokens=0, **kw)
    out, _ = model.generate(params, jax.random.PRNGKey(6), ids, mask,
                            spec_tokens=3, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


def test_composite_design_with_speculation():
    """End-to-end: design_molecule runs with speculation enabled."""
    from llamole_tpu.config import (DataArguments, FinetuningArguments,
                                    ModelArguments)
    from llamole_tpu.models.loader import build_graph_lm

    model_args = ModelArguments(model_name_or_path="")
    data_args = DataArguments(dataset="synth", template="default",
                              cutoff_len=256, learned_query_size=8)
    ft_args = FinetuningArguments(lora_rank=4)
    model, frozen, trainable, tok = build_graph_lm(
        model_args, data_args, ft_args, seed=0)
    prompt = "Design a molecule that is synthesizable."
    enc = tok.encode(prompt)
    ids = np.asarray(enc, np.int32)[None, :]
    mask = np.ones_like(ids)
    props = np.full((1, 10), np.nan, np.float32)
    from llamole_tpu.models.composite import GenerationSettings
    gen = GenerationSettings(max_new_tokens=16, do_sample=True,
                             speculative_tokens=2)
    analysis, smiles = model.design_molecule(
        frozen, trainable, jax.random.PRNGKey(0), ids, mask, props, gen=gen)
    assert len(smiles) == 1


def test_spec_with_int8_kv_cache():
    """Speculation writes K+1-row blocks into the cache; the int8
    quantize-on-write path must handle multi-row writes (greedy output
    matches the bf16-cache spec run on near-identical logits)."""
    cfg = LLMConfig.tiny(vocab_size=96)
    cfg.kv_cache_dtype = "int8"
    model = LLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    ids, mask = _prompt(b=2)
    out, done = model.generate(params, jax.random.PRNGKey(1), ids, mask,
                               max_new_tokens=12, do_sample=False,
                               temperature=0.0, pad_id=0, spec_tokens=3)
    base, _ = model.generate(params, jax.random.PRNGKey(1), ids, mask,
                             max_new_tokens=12, do_sample=False,
                             temperature=0.0, pad_id=0, spec_tokens=0)
    # int8 cache error can flip near-tied argmaxes on a random model;
    # demand a long exact prefix rather than full equality
    diff = np.nonzero((np.asarray(out) != np.asarray(base)).any(axis=0))[0]
    first_div = int(diff[0]) if len(diff) else 12
    assert first_div >= 8, "diverged at token %d" % first_div
    # guard continuation with the quantized cache: forcing an immediate
    # trip routes through the plain continuation loop, whose int8
    # dequant reads must behave like the scan path's
    g_out, _ = model.generate(params, jax.random.PRNGKey(1), ids, mask,
                              max_new_tokens=12, do_sample=False,
                              temperature=0.0, pad_id=0, spec_tokens=3,
                              spec_probe=1, spec_min_accept=4.0)
    diff = np.nonzero((np.asarray(g_out) != np.asarray(base)).any(axis=0))[0]
    first_div = int(diff[0]) if len(diff) else 12
    assert first_div >= 8, "guard path diverged at token %d" % first_div


def test_acceptance_guard_trips_on_adversarial_history(tiny):
    """Random history + random weights = near-zero draft acceptance: the
    guard must abandon drafting right after the probe window (iters ==
    probe) and finish via the plain continuation loop with EXACTLY the
    scan path's greedy output. Measured worst-case envelope at 8B on
    the chip: 0.94x of the plain loop at the auto default K=2 (probe
    surcharge + continuation steps attending over the longer spec cache
    layout; NOTES_ROUND4.md) vs 0.73x unguarded."""
    model, params = tiny
    ids, mask = _prompt()
    kw = dict(max_new_tokens=32, do_sample=False, temperature=0.0,
              pad_id=0, return_trigger=True, return_spec_iters=True)
    base, b_done, b_trig, _ = model.generate(
        params, jax.random.PRNGKey(9), ids, mask, spec_tokens=0, **kw)
    out, done, trig, iters = model.generate(
        params, jax.random.PRNGKey(9), ids, mask,
        spec_tokens=4, spec_probe=4, spec_min_accept=2.0, **kw)
    # min_accept=2.0 is unreachable for K=4 random drafts -> guard trips
    # at the first post-probe check
    assert int(iters) == 4, f"guard should trip at probe boundary, {iters=}"
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
    np.testing.assert_array_equal(np.asarray(b_done), np.asarray(done))
    np.testing.assert_array_equal(np.asarray(b_trig), np.asarray(trig))


def test_acceptance_guard_keeps_good_drafting(tiny):
    """Cyclic continuation keeps acceptance high: the guard must NOT
    trip (spec iterations < max_new proves multi-token emission)."""
    model, params = tiny
    pat = np.array([7, 11, 13, 17, 19, 23], np.int32)
    ids = jnp.asarray(np.tile(pat, 4)[None, :])
    mask = jnp.ones_like(ids)
    kw = dict(max_new_tokens=30, do_sample=False, temperature=0.0,
              pad_id=0, return_spec_iters=True)
    base, _, _ = model.generate(params, jax.random.PRNGKey(2), ids, mask,
                                spec_tokens=0, **kw)
    out, _, iters = model.generate(
        params, jax.random.PRNGKey(2), ids, mask,
        spec_tokens=4, spec_ngram=2, spec_probe=4, spec_min_accept=0.5,
        **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))
    assert int(iters) < 30  # emitted >1 token/step on average


def test_greedy_defaults_to_speculation(tiny):
    """spec_tokens=None (the default) auto-enables drafting for greedy
    decode; output still matches the scan path exactly."""
    model, params = tiny
    ids, mask = _prompt(b=2)
    kw = dict(max_new_tokens=12, do_sample=False, temperature=0.0,
              pad_id=0, return_spec_iters=True)
    out_auto, _, iters_auto = model.generate(
        params, jax.random.PRNGKey(7), ids, mask, **kw)
    out_scan, _, iters_scan = model.generate(
        params, jax.random.PRNGKey(7), ids, mask, spec_tokens=0, **kw)
    np.testing.assert_array_equal(np.asarray(out_auto),
                                  np.asarray(out_scan))
    # sampled decode stays off by default (iters == per-token steps)
    kw_s = dict(max_new_tokens=12, do_sample=True, temperature=0.8,
                pad_id=0, return_spec_iters=True)
    _, _, iters_sampled = model.generate(
        params, jax.random.PRNGKey(8), ids, mask, **kw_s)
    assert int(iters_sampled) == 12  # plain loop: one step per token


def test_guard_continuation_boundary_stop_matches_scan(tiny):
    """A stop token sampled exactly at the budget boundary AFTER the
    guard trips must set done/trigger like the scan path's final step
    (code-review r3 finding #1: the continuation used to retire rows on
    budget without the boundary forward)."""
    model, params = tiny
    found = False
    for seed in range(1, 8):
        ids, mask = _prompt(b=3, p=9)
        # learn the continuation; boundary token = index T
        T = 8
        base9, _ = model.generate(params, jax.random.PRNGKey(seed), ids,
                                  mask, max_new_tokens=T + 1,
                                  do_sample=False, temperature=0.0,
                                  pad_id=0, spec_tokens=0)
        base9 = np.asarray(base9)
        for row in range(base9.shape[0]):
            boundary_tok = int(base9[row, T])
            if boundary_tok != 0 and boundary_tok not in base9[row, :T]:
                found = True
                eos = (boundary_tok,)
                break
        if found:
            break
    assert found, "no unique boundary token in any seed — fixture broken"

    kw = dict(max_new_tokens=T, do_sample=False, temperature=0.0,
              pad_id=0, eos_ids=eos, return_trigger=True)
    s_out, s_done, s_trig = model.generate(
        params, jax.random.PRNGKey(seed), ids, mask, spec_tokens=0, **kw)
    # force the guard to trip immediately: unreachable acceptance bar
    g_out, g_done, g_trig = model.generate(
        params, jax.random.PRNGKey(seed), ids, mask,
        spec_tokens=3, spec_probe=1, spec_min_accept=4.0, **kw)
    np.testing.assert_array_equal(np.asarray(s_out), np.asarray(g_out))
    np.testing.assert_array_equal(np.asarray(s_done), np.asarray(g_done))
    np.testing.assert_array_equal(np.asarray(s_trig), np.asarray(g_trig))
    assert bool(np.asarray(s_done)[row])  # the boundary stop did fire


@pytest.mark.slow
def test_sampled_marginals_exact_with_guard_trip(tiny):
    """Sampled decode with the guard tripping mid-generation: the
    continuation loop consumes RNG differently from both the scan and
    pure-spec paths, but every token is still drawn from the correct
    warped distribution — per-position marginals must match the scan
    path (same harness as test_sampled_marginals_match)."""
    model, params = tiny
    n = 2048
    ids = jnp.tile(jnp.asarray([[5, 9, 33, 70]], jnp.int32), (n, 1))
    mask = jnp.ones_like(ids)
    kw = dict(max_new_tokens=6, do_sample=True, temperature=1.0,
              top_p=0.9, pad_id=0)
    base, _ = model.generate(params, jax.random.PRNGKey(3), ids, mask,
                             spec_tokens=0, **kw)
    base2, _ = model.generate(params, jax.random.PRNGKey(5), ids, mask,
                              spec_tokens=0, **kw)
    # force the guard to trip after 2 verify steps
    out, _ = model.generate(params, jax.random.PRNGKey(4), ids, mask,
                            spec_tokens=3, spec_probe=2,
                            spec_min_accept=4.0, **kw)
    base, base2, out = np.asarray(base), np.asarray(base2), np.asarray(out)
    for pos in range(6):
        hb = np.bincount(base[:, pos], minlength=96) / n
        hb2 = np.bincount(base2[:, pos], minlength=96) / n
        hs = np.bincount(out[:, pos], minlength=96) / n
        tv = 0.5 * np.abs(hb - hs).sum()
        tv_floor = 0.5 * np.abs(hb - hb2).sum()
        assert tv < 1.5 * tv_floor + 0.05, \
            f"pos {pos}: TV {tv:.3f} vs floor {tv_floor:.3f}"
