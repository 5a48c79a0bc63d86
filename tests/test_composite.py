"""Composite GraphLM tests: three-term loss, gradient flow restricted to
trainable params, design generation end-to-end on tiny random models."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.config import DataArguments, FinetuningArguments, ModelArguments
from llamole_tpu.data.collator import SeqGraphCollator
from llamole_tpu.data.loader import get_dataset
from llamole_tpu.models.composite import GenerationSettings
from llamole_tpu.models.loader import build_graph_lm


SYNTH_RECORDS = [
    {
        "instruction": "Design and synthesize a small alcohol.",
        "input": "",
        "output": (
            "The design is: <design_start><design_end><mol_start>CCO<mol_end>. "
            "This is step 1 in the retrosynthesis process. To synthesize "
            "<mol_start>CCO<mol_end>, follow these procedures: mix things. "
            "The applied reaction is: <retro_start><retro_end>CCO>>CC.O, "
            "which requires the reactants: CC (available), O (available)."),
        "property": {"SC": 2.0, "SA": 3.0},
        "retro": [5],
    },
    {
        "instruction": "Design an aromatic molecule.",
        "input": "",
        "output": (
            "Sure: <design_start><design_end><mol_start>c1ccccc1<mol_end>. "
            "This is step 1 in the retrosynthesis process. To synthesize "
            "<mol_start>c1ccccc1<mol_end>, follow these procedures: heat. "
            "The applied reaction is: <retro_start><retro_end>c1ccccc1>>CCO, "
            "which requires the reactants: CCO (available)."),
        "property": {"HIV": 1.0, "SC": 1.0, "SA": 2.0},
        "retro": [3],
    },
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    with open(data_dir / "synth.json", "w") as f:
        json.dump(SYNTH_RECORDS, f)
    model_args = ModelArguments(model_name_or_path="")
    data_args = DataArguments(
        dataset="synth", dataset_dir=str(data_dir),
        template="default", cutoff_len=512, learned_query_size=8)
    ft_args = FinetuningArguments(lora_rank=4)
    model, frozen, trainable, tok = build_graph_lm(
        model_args, data_args, ft_args, seed=0)
    bank, inputs = get_dataset(model_args, data_args, None, tok)
    n = model.graph_decoder.cfg.max_n_nodes
    collator = SeqGraphCollator(
        tokenizer=tok, mol_id_to_graph=bank, max_len=512,
        max_nodes=n, max_graphs=32, max_retro=32)
    batch = {k: jnp.asarray(v) for k, v in collator(inputs).items()}
    return model, frozen, trainable, tok, batch


def test_three_term_loss(setup):
    model, frozen, trainable, tok, batch = setup
    total, aux = model.loss_fn(trainable, frozen, jax.random.PRNGKey(0), batch)
    assert np.isfinite(float(total))
    for k in ("lm_loss", "design_loss", "retro_loss"):
        assert np.isfinite(float(aux[k])), k
    # weighted sum holds
    expect = (model.loss_weight_lm * float(aux["lm_loss"])
              + model.loss_weight_design * float(aux["design_loss"])
              + model.loss_weight_retro * float(aux["retro_loss"]))
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)


def test_gradients_only_on_trainable(setup):
    model, frozen, trainable, tok, batch = setup

    # At random init the graph modules' AdaLN layers are zero (faithful to
    # the reference init), which blocks conditioning gradients; pretrained
    # weights are nonzero there. Emulate that with a small perturbation.
    perturbed = dict(frozen)
    key = jax.random.PRNGKey(42)
    leaves, treedef = jax.tree.flatten(frozen["graph_decoder"])
    keys = jax.random.split(key, len(leaves))
    perturbed["graph_decoder"] = jax.tree.unflatten(
        treedef, [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])
    leaves, treedef = jax.tree.flatten(frozen["graph_predictor"])
    keys = jax.random.split(jax.random.PRNGKey(43), len(leaves))
    perturbed["graph_predictor"] = jax.tree.unflatten(
        treedef, [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])

    def loss(t):
        return model.loss_fn(t, perturbed, jax.random.PRNGKey(0), batch)[0]

    grads = jax.grad(loss)(trainable)
    leaves = jax.tree.leaves(grads)
    assert leaves, "no trainable grads"
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert np.isfinite(total) and total > 0
    # every connector must receive gradient (they are the only new params)
    for name in ("graph_to_lm", "lm_to_graph_decoder", "lm_to_graph_predictor"):
        conn = grads["connectors"][name]["w"]
        assert float(jnp.sum(jnp.abs(conn))) > 0, name


def test_design_generation_end_to_end(setup):
    model, frozen, trainable, tok, batch = setup
    prompt = "Design a molecule with high solubility."
    ids = tok.encode("User: " + prompt + "\nAssistant: ")
    input_ids = np.asarray([ids], np.int32)
    mask = np.ones_like(input_ids)
    props = np.full((1, 10), -200.0, np.float32)
    gen = GenerationSettings(max_new_tokens=8, do_sample=False)
    analysis, smiles = model.design_molecule(
        frozen, trainable, jax.random.PRNGKey(0), input_ids, mask, props,
        gen=gen, rollback=False)
    assert analysis.shape == (1, 8)
    assert len(smiles) == 1
    assert smiles[0] is None or isinstance(smiles[0], str)


def test_save_load_trainable(setup, tmp_path):
    model, frozen, trainable, tok, batch = setup
    model.save_pretrained(trainable, str(tmp_path / "ckpt"))
    loaded = model.load_trainable(str(tmp_path / "ckpt"))
    for a, b in zip(jax.tree.leaves(trainable), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    cfg = json.load(open(tmp_path / "ckpt" / "graphllm_config.json"))
    assert cfg["num_body_tokens"] == 8


def test_design_resamples_redraws_before_rollback(setup):
    """A failed diffusion assembly redraws from the sampler (same
    compiled shape) before any LLM rollback; resamples=0 keeps the
    reference protocol (straight to rollback / None)."""
    model, frozen, trainable, tok, batch = setup
    prompt = [tok.encode("User: design something\nAssistant: ")]
    analysis = [tok.encode("an alcohol")]
    props = np.full((1, 10), -200.0, np.float32)

    calls = {"n": 0}
    orig = model.graph_decoder.generate

    def flaky_generate(params, rng, properties, text_emb, mesh=None):
        calls["n"] += 1
        out = orig(params, rng, properties, text_emb, mesh=mesh)
        if calls["n"] == 1:
            return [None] * len(out)
        return ["CCO"] * len(out)

    def no_rollback(*a, **k):
        raise AssertionError("rollback must not run when a redraw succeeds")

    orig_rb = model.design_rollback
    model.graph_decoder.generate = flaky_generate
    model.design_rollback = no_rollback
    try:
        smiles = model.design_from_analysis(
            frozen, trainable, jax.random.PRNGKey(0), prompt, analysis,
            props, gen=GenerationSettings(design_resamples=2), rollback=True)
        assert smiles == ["CCO"]
        assert calls["n"] == 2  # one redraw sufficed; loop exits early

        # resamples=0 = reference protocol: no redraw, rollback disabled
        # -> the failure surfaces as None
        calls["n"] = 0

        def always_fail(params, rng, properties, text_emb, mesh=None):
            calls["n"] += 1
            return [None] * properties.shape[0]

        model.graph_decoder.generate = always_fail
        smiles = model.design_from_analysis(
            frozen, trainable, jax.random.PRNGKey(0), prompt, analysis,
            props, gen=GenerationSettings(design_resamples=0), rollback=False)
        assert smiles == [None]
        assert calls["n"] == 1
    finally:
        model.graph_decoder.generate = orig
        model.design_rollback = orig_rb
