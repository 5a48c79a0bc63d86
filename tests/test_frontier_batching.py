"""Frontier-batched search tests: batched expansion reaches the same
route success as sequential expansion on deterministic fakes."""

import pytest

from llamole_tpu.planner import retro_star_search

TREE = {
    "T": (["X", "Y"], [0.6, 0.4]),
    "X": (["A.B"], [0.9]),
    "Y": (["C"], [0.8]),
}


def _expand(s):
    if s in TREE:
        reactants, scores = TREE[s]
        return {"reactants": reactants, "scores": scores,
                "templates": ["t"] * len(reactants), "analysis": None}
    return None


def _batch_expand(smiles_list):
    return [_expand(s) for s in smiles_list]


def _value(s, r):
    return 0.0


def test_batched_matches_sequential_success():
    seq = retro_star_search("T", {"A", "B", "C"}, _expand, _value,
                            iterations=20)
    bat = retro_star_search("T", {"A", "B", "C"}, _expand, _value,
                            iterations=20, expansion_width=4,
                            batch_expand_fn=_batch_expand)
    assert seq[0] and bat[0]
    # same optimal-cost route found (route success parity)
    assert seq[1].total_cost == pytest.approx(bat[1].total_cost)


def test_batch_value_fn_used():
    calls = []

    def batch_value(smiles_list):
        calls.append(list(smiles_list))
        return [0.5] * len(smiles_list)

    succ, route, _ = retro_star_search(
        "T", {"A", "B", "C"}, _expand, _value, iterations=20,
        expansion_width=2, batch_expand_fn=_batch_expand,
        batch_value_fn=batch_value)
    assert succ
    assert calls, "batch value fn never used"
    # fresh reactants (non-purchasable intermediates) scored in batches
    flat = {s for chunk in calls for s in chunk}
    assert "X" in flat or "Y" in flat


def test_width_one_is_pure_sequential():
    order = []

    def expand(s):
        order.append(s)
        return _expand(s)

    retro_star_search("T", {"A", "B", "C"}, expand, _value,
                      iterations=20, expansion_width=1)
    assert order[0] == "T"
    assert len(order) <= 3


@pytest.fixture(scope="module")
def stack():
    from llamole_tpu.config import (DataArguments, FinetuningArguments,
                                    ModelArguments)
    from llamole_tpu.models.loader import build_graph_lm

    return build_graph_lm(
        ModelArguments(model_name_or_path=""), DataArguments(),
        FinetuningArguments(), seed=0)


@pytest.mark.slow
def test_retrosynthesize_batch_cross_target(stack):
    """Composite-level: one interleaved search over two targets returns
    per-target result dicts with the retrosynthesize schema, keyed by
    the caller's spellings (incl. a non-canonical variant), and the
    generate() Phase-2 branch routes through it at frontier_width>1."""
    import jax
    import numpy as np

    from llamole_tpu.models.composite import GenerationSettings

    model, frozen, trainable, tok = stack
    gen = GenerationSettings(max_new_tokens=8, do_sample=True)

    targets = ["CC(=O)OCC", "c1ccncc1"]  # first is non-canonical
    out = model.retrosynthesize_batch(
        frozen, trainable, jax.random.PRNGKey(0), targets,
        iterations=2, max_planning_time=20.0, gen=gen, total_width=4,
        rollback=False)
    assert set(out) == set(targets)
    for smi in targets:
        res = out[smi]
        assert "success" in res and "target" in res
        # planner effort accounting (run_molqa's expansions/mol summary)
        assert isinstance(res["expansions"], int)
        if res["success"]:
            assert res["reaction_list"]
            assert res["expansions"] >= 1

    # generate() Phase-2 takes the batch branch at frontier_width > 1
    prompt = tok.encode("retro these")
    ids = np.tile(np.asarray(prompt, np.int32)[None], (2, 1))
    info = model.generate(
        frozen, trainable, jax.random.PRNGKey(1), ids,
        do_molecular_design=False, do_retrosynthesis=True,
        input_smiles_list=targets, iterations=1, max_planning_time=10.0,
        gen=gen, frontier_width=4, rollback=False)
    # keys are the canonicalized smiles_list entries
    assert len(info["retro_plan_dict"]) == 2
    for smi in info["smiles_list"]:
        assert smi in info["retro_plan_dict"]


@pytest.mark.slow
def test_batch_planning_wall_is_concurrent(stack, monkeypatch):
    """retrosynthesize_batch passes max_planning_time to the multi-target
    search UNSCALED: every tree runs concurrently under one shared
    per-molecule wall (the reference spends the same wall sequentially
    per molecule — eval/workflow.py:172-173). A refactor that restores
    the old n*max_time scaling would silently multiply Phase-2 eval
    wall-clock by the batch size."""
    import jax

    import llamole_tpu.planner as planner_mod
    from llamole_tpu.models.composite import GenerationSettings

    model, frozen, trainable, tok = stack
    seen = {}
    real = planner_mod.retro_star_search_multi

    def capture(targets, known, expand, value, **kw):
        seen["max_time"] = kw["max_time"]
        return real(targets, known, expand, value, **kw)

    monkeypatch.setattr(planner_mod, "retro_star_search_multi", capture)
    gen = GenerationSettings(max_new_tokens=8, do_sample=True)
    model.retrosynthesize_batch(
        frozen, trainable, jax.random.PRNGKey(2), ["CCO", "c1ccncc1"],
        iterations=1, max_planning_time=17.5, gen=gen, total_width=2,
        rollback=False)
    assert seen["max_time"] == 17.5
    # reference engine-budget protocol: wall scales by unique targets
    model.retrosynthesize_batch(
        frozen, trainable, jax.random.PRNGKey(2), ["CCO", "c1ccncc1"],
        iterations=1, max_planning_time=17.5, gen=gen, total_width=2,
        rollback=False, share_planning_wall=False)
    assert seen["max_time"] == 35.0


@pytest.mark.slow
def test_batched_expansion_dp_sharded_matches_unsharded(stack):
    """batched_one_step_reaction under a dp mesh returns the same
    proposals as the unsharded run (GSPMD layout must not change the
    math; same rng)."""
    import jax

    from llamole_tpu.models.composite import GenerationSettings
    from llamole_tpu.parallel import create_mesh

    model, frozen, trainable, tok = stack
    gen = GenerationSettings(max_new_tokens=8, do_sample=True)
    products = ["CC(=O)OCC", "c1ccncc1", "CCO"]

    base = model.batched_one_step_reaction(
        frozen, trainable, jax.random.PRNGKey(3), products,
        topk=2, gen=gen, analysis_tokens=8)
    mesh = create_mesh(dp=2)
    sharded = model.batched_one_step_reaction(
        frozen, trainable, jax.random.PRNGKey(3), products,
        topk=2, gen=gen, analysis_tokens=8, mesh=mesh)
    assert len(base) == len(sharded) == 3
    for b, s in zip(base, sharded):
        assert b["reactants"] == s["reactants"]
        assert b["templates"] == s["templates"]
        assert b["analysis"] == s["analysis"]


@pytest.mark.slow
def test_pad_rows_to_does_not_change_real_rows(stack):
    """pad_rows_to widens the expansion batch with replicated rows; under
    greedy decode every real row's result must be IDENTICAL to the
    unpadded run (rows are independent through attention/decode — a
    divergence would mean padding leaks into real rows)."""
    import jax

    from llamole_tpu.models.composite import GenerationSettings

    model, frozen, trainable, tok = stack
    gen = GenerationSettings(max_new_tokens=8, do_sample=False)
    products = ["CC(=O)OCC", "c1ccncc1", "CCO"]

    base = model.batched_one_step_reaction(
        frozen, trainable, jax.random.PRNGKey(7), products,
        topk=2, gen=gen, analysis_tokens=8)
    padded = model.batched_one_step_reaction(
        frozen, trainable, jax.random.PRNGKey(7), products,
        topk=2, gen=gen, analysis_tokens=8, pad_rows_to=8)
    assert len(base) == len(padded) == 3
    for b, p in zip(base, padded):
        assert b["reactants"] == p["reactants"]
        assert b["templates"] == p["templates"]
        assert b["analysis"] == p["analysis"]


@pytest.mark.slow
def test_empty_flat_prefix_is_scalar_conditioning(stack):
    """An empty prefix_ids/design_text list means 'no prefix for every
    row', not a zero-row per-row spec (code-review r3b finding #1:
    all-pad prompts strip to [] and used to crash the expansion)."""
    import jax

    from llamole_tpu.models.composite import GenerationSettings

    model, frozen, trainable, tok = stack
    gen = GenerationSettings(max_new_tokens=8, do_sample=True)
    res = model.batched_one_step_reaction(
        frozen, trainable, jax.random.PRNGKey(5), ["CCO", "CC(=O)O"],
        design_text=[], prefix_ids=[], topk=2, gen=gen, analysis_tokens=8)
    assert len(res) == 2
    for r in res:
        assert "reactants" in r and "analysis" in r
