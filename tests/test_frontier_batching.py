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
