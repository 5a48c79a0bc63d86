"""Decode-cache query extension (design re-forward elision).

design_molecule appends <design_start> + K <design_body> tokens after
the decoded analysis and needs their hidden states for the GraphDiT
condition. The reference re-forwards the whole prompt+analysis+query
sequence (modeling_llamole.py:584-663); composite._body_hidden_extend_jit
instead forwards ONLY the appended query tokens on top of the decode KV
cache. These tests pin the invariant that both produce the same hiddens
— across variable prompt lengths, variable stop lengths, a cache filled
to exactly its allocation, int8 KV storage, and stacked (scan-layers)
cache layout."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.config import DataArguments, FinetuningArguments, ModelArguments
from llamole_tpu.models.composite import GenerationSettings
from llamole_tpu.models.loader import build_graph_lm


def _build(tmp_path_factory, **margs):
    data_dir = tmp_path_factory.mktemp("data")
    rec = [{"instruction": "Design.", "input": "",
            "output": ("x <design_start><design_end><mol_start>CCO<mol_end> y "
                       "<retro_start><retro_end>CCO>>CC.O, reactants: CC "
                       "(available)."),
            "property": {"SA": 2.0}, "retro": [5]}]
    with open(data_dir / "synth.json", "w") as f:
        json.dump(rec, f)
    model_args = ModelArguments(model_name_or_path="", **margs)
    data_args = DataArguments(dataset="synth", dataset_dir=str(data_dir),
                              template="default", cutoff_len=256)
    model, frozen, trainable, tok = build_graph_lm(
        model_args, data_args, FinetuningArguments(lora_rank=4), seed=0)
    return model, frozen, trainable, tok


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    return _build(tmp_path_factory)


def _prompts(tok, b=3):
    """Left-padded batch with per-row prompt lengths."""
    texts = ["Design a molecule.",
             "Please design a very soluble aromatic molecule for me.",
             "Hi."]
    seqs = [tok.encode(t) for t in texts[:b]]
    pad = tok.pad_token_id
    width = max(len(s) for s in seqs)
    ids = np.full((b, width), pad, np.int32)
    mask = np.zeros((b, width), np.int32)
    for i, s in enumerate(seqs):
        ids[i, -len(s):] = s
        mask[i, -len(s):] = 1
    return ids, mask


def _ext_ids(model, b):
    ext = np.full((b, 1 + model.num_body_tokens),
                  model.token_id_dict["<design_body>"], np.int32)
    ext[:, 0] = model.token_id_dict["<design_start>"]
    return jnp.asarray(ext)


def _reforward_hidden(model, frozen, trainable, input_ids, analysis):
    """The surgery re-forward path, exactly as design_from_analysis
    builds it."""
    b = analysis.shape[0]
    prompts = [model._strip_pads(np.asarray(input_ids)[i]) for i in range(b)]
    analyses = [model._strip_pads(np.asarray(analysis)[i]) for i in range(b)]
    ds = model.token_id_dict["<design_start>"]
    body = model.token_id_dict["<design_body>"]
    seqs = [list(p) + list(a) + [ds] + [body] * model.num_body_tokens
            for p, a in zip(prompts, analyses)]
    ids, mask = model._left_pad(seqs)
    return model._body_hidden_jit(frozen, trainable,
                                  jnp.asarray(ids), jnp.asarray(mask))


def _run_pair(model, frozen, trainable, tok, *, eos_ids, max_new=12, seed=0):
    ids, mask = _prompts(tok)
    gen = GenerationSettings(max_new_tokens=max_new, do_sample=True,
                             speculative_tokens=0)
    analysis, _, state = model._generate_tokens(
        frozen, trainable, ids, mask, jax.random.PRNGKey(seed), gen,
        eos_ids, want_state=True)
    assert state is not None
    # precondition of the comparison: no row emitted the literal pad id
    # MID-analysis (the surgery path strips it; the cache keeps it —
    # pathological under trained weights where pad stops decoding).
    # Trailing pads are the normal post-stop fill and are fine.
    arr = np.asarray(analysis)
    for row in arr:
        real = np.nonzero(row != tok.pad_token_id)[0]
        if real.size:
            assert (row[:real.max() + 1] != tok.pad_token_id).all(), \
                f"row emitted the pad id mid-analysis: {row.tolist()}"
    h_ext = model._body_hidden_extend_jit(
        frozen, trainable, state["cache"], state["kv_valid"],
        _ext_ids(model, analysis.shape[0]))
    h_ref = _reforward_hidden(model, frozen, trainable, ids, analysis)
    return np.asarray(h_ext), np.asarray(h_ref), analysis


def test_extension_matches_reforward_variable_stops(tiny):
    """Broad eos set => rows stop at different lengths; per-row write
    offsets and RoPE positions must line up with the re-forward."""
    model, frozen, trainable, tok = tiny
    # every 7th vocab id stops decoding -> geometric per-row lengths
    eos = tuple(range(5, model.llm.cfg.vocab_size, 7))
    h_ext, h_ref, analysis = _run_pair(model, frozen, trainable, tok,
                                       eos_ids=eos)
    lens = [(np.asarray(analysis)[i] != tok.pad_token_id).sum()
            for i in range(analysis.shape[0])]
    assert len(set(lens)) > 1, f"want variable stop lengths, got {lens}"
    np.testing.assert_allclose(h_ext, h_ref, rtol=1e-4, atol=1e-4)


def test_extension_matches_reforward_full_budget(tiny):
    """No stops: the decode fills its cache allocation exactly and the
    extension must grow it (extend_kv_cache)."""
    model, frozen, trainable, tok = tiny
    h_ext, h_ref, analysis = _run_pair(model, frozen, trainable, tok,
                                       eos_ids=(), max_new=9, seed=3)
    assert (np.asarray(analysis) != tok.pad_token_id).all()
    np.testing.assert_allclose(h_ext, h_ref, rtol=1e-4, atol=1e-4)


def test_extension_no_grow_on_reserved_cache(tiny):
    """The production path (design_molecule): _generate_tokens reserves
    1+K extension slots in the decode cache, so the extension runs with
    grow=False — NO O(cache) grow-copy (the transient copy cost ~2 GB of
    peak HBM at the 8B b96 e2e shape and tipped the bench into OOM).
    Hiddens must still match the re-forward exactly."""
    model, frozen, trainable, tok = tiny
    ids, mask = _prompts(tok)
    gen = GenerationSettings(max_new_tokens=9, do_sample=True,
                             speculative_tokens=0)
    analysis, _, state = model._generate_tokens(
        frozen, trainable, ids, mask, jax.random.PRNGKey(3), gen,
        (), want_state=True)
    s = 1 + model.num_body_tokens
    # the reserve is actually allocated: cache T = P + max_new + (1+K)
    assert state["kv_valid"].shape[1] == ids.shape[1] + 9 + s
    h_ext = model._body_hidden_extend_jit(
        frozen, trainable, state["cache"], state["kv_valid"],
        _ext_ids(model, analysis.shape[0]), grow=False)
    h_ref = _reforward_hidden(model, frozen, trainable, ids, analysis)
    np.testing.assert_allclose(np.asarray(h_ext), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-4)


def test_extension_int8_kv(tmp_path_factory):
    """int8 cache: extension reads quantized prompt/analysis KVs, so it
    tracks the fp re-forward only to quantization error — but must run
    and stay close."""
    model, frozen, trainable, tok = _build(tmp_path_factory,
                                           kv_cache_dtype="int8")
    eos = tuple(range(5, model.llm.cfg.vocab_size, 7))
    h_ext, h_ref, _ = _run_pair(model, frozen, trainable, tok, eos_ids=eos)
    denom = np.maximum(np.abs(h_ref), 1e-3)
    assert np.median(np.abs(h_ext - h_ref) / denom) < 0.05


def test_extension_stacked_layers(tmp_path_factory):
    """scan-over-layers param storage uses the stacked [L,B,T,KV,D]
    cache dict — exercises extend_kv_cache's dict branch."""
    model, frozen, trainable, tok = _build(tmp_path_factory,
                                           scan_layers=True)
    eos = tuple(range(5, model.llm.cfg.vocab_size, 7))
    h_ext, h_ref, _ = _run_pair(model, frozen, trainable, tok, eos_ids=eos)
    np.testing.assert_allclose(h_ext, h_ref, rtol=1e-4, atol=1e-4)


def test_design_molecule_same_smiles_with_and_without_reuse(tiny):
    """End-to-end: same PRNG key, reuse on vs off -> identical designs
    (fp32 CPU; the extension consumes no extra randomness)."""
    model, frozen, trainable, tok = tiny
    ids, mask = _prompts(tok)
    props = np.full((3, 10), np.nan, np.float32)
    on = GenerationSettings(max_new_tokens=8, do_sample=True,
                            speculative_tokens=0, reuse_decode_cache=True)
    off = GenerationSettings(max_new_tokens=8, do_sample=True,
                             speculative_tokens=0, reuse_decode_cache=False)
    a1, s1 = model.design_molecule(frozen, trainable, jax.random.PRNGKey(5),
                                   ids, mask, props, gen=on)
    a2, s2 = model.design_molecule(frozen, trainable, jax.random.PRNGKey(5),
                                   ids, mask, props, gen=off)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert s1 == s2
