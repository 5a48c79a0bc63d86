"""Planner tests with fake expand/value functions — the one mockable
seam the reference exposes (molstar.py:9 closures; SURVEY.md §4d)."""

import math

import pytest

from llamole_tpu.planner import retro_star_search
from llamole_tpu.planner.search import SearchTree


def _value_zero(smiles, reaction):
    return 0.0


def test_one_step_route():
    # T -> A.B with A,B purchasable
    def expand(s):
        if s == "T":
            return {"reactants": ["A.B"], "scores": [0.9],
                    "templates": ["t1"], "analysis": [1, 2, 3]}
        return None

    succ, route, iters = retro_star_search(
        "T", {"A", "B"}, expand, _value_zero, iterations=10)
    assert succ and iters == 1
    reactions, templates, costs, analysis = route.get_reaction_list()
    assert reactions == ["T>>A.B"]
    assert templates == ["t1"]
    assert costs[0] == pytest.approx(0.9, rel=1e-6)
    assert route.length == 1


def test_first_proven_route_returned():
    """Search stops at the first success (parity: molstar.py:61-62 —
    the reference breaks as soon as the root is proven)."""
    def expand(s):
        if s == "T":
            return {"reactants": ["X", "C"], "scores": [0.9, 0.1],
                    "templates": ["tx", "tc"], "analysis": None}
        if s == "X":
            return {"reactants": ["A.B"], "scores": [0.8],
                    "templates": ["txab"], "analysis": None}
        return None

    succ, route, iters = retro_star_search(
        "T", {"A", "B", "C"}, expand, _value_zero, iterations=10)
    assert succ and iters == 1
    reactions, *_ = route.get_reaction_list()
    assert reactions == ["T>>C"]  # direct option proves first


def test_multi_step_route_found_when_direct_dead_ends():
    def expand(s):
        if s == "T":
            return {"reactants": ["X", "C"], "scores": [0.1, 0.9],
                    "templates": ["tx", "tc"], "analysis": None}
        if s == "X":
            return {"reactants": ["A.B"], "scores": [0.8],
                    "templates": ["txab"], "analysis": None}
        return None  # C is a dead end

    succ, route, _ = retro_star_search(
        "T", {"A", "B"}, expand, _value_zero, iterations=10)
    assert succ
    reactions, templates, costs, _ = route.get_reaction_list()
    assert route.length == 2
    assert reactions[0] == "T>>X"
    assert reactions[1] == "X>>A.B"


def test_direct_route_wins_when_cheaper():
    def expand(s):
        if s == "T":
            return {"reactants": ["X", "C"], "scores": [0.1, 0.9],
                    "templates": ["tx", "tc"], "analysis": None}
        if s == "X":
            return {"reactants": ["A.B"], "scores": [0.9],
                    "templates": ["txab"], "analysis": None}
        return None

    succ, route, _ = retro_star_search(
        "T", {"A", "B", "C"}, expand, _value_zero, iterations=10)
    assert succ
    reactions, *_ = route.get_reaction_list()
    assert reactions == ["T>>C"]


def test_failure_when_no_route():
    def expand(s):
        return None

    succ, route, iters = retro_star_search(
        "T", {"A"}, expand, _value_zero, iterations=5)
    assert not succ and route is None
    # one expansion + the iteration that finds no open nodes
    # (parity: molstar.py returns i+1 after the inf-scores break)
    assert iters == 2


def test_cycles_are_rejected():
    # T -> U -> T would loop forever without ancestor rejection
    def expand(s):
        if s == "T":
            return {"reactants": ["U"], "scores": [0.9],
                    "templates": ["a"], "analysis": None}
        if s == "U":
            return {"reactants": ["T", "A"], "scores": [0.9, 0.5],
                    "templates": ["b", "c"], "analysis": None}
        return None

    succ, route, _ = retro_star_search(
        "T", {"A"}, expand, _value_zero, iterations=10)
    assert succ
    reactions, *_ = route.get_reaction_list()
    assert reactions == ["T>>U", "U>>A"]


def test_value_fn_guides_selection():
    """Node with lower estimated value expands first."""
    order = []

    def expand(s):
        order.append(s)
        if s == "T":
            return {"reactants": ["X", "Y"], "scores": [0.5, 0.5],
                    "templates": ["t", "t"], "analysis": None}
        if s in ("X", "Y"):
            return {"reactants": ["A"], "scores": [0.9],
                    "templates": ["t"], "analysis": None}
        return None

    def value(s, r):
        return {"X": 5.0, "Y": 0.1}.get(s, 0.0)

    succ, route, _ = retro_star_search(
        "T", {"A"}, expand, value, iterations=10)
    assert succ
    assert order[1] == "Y"  # cheaper estimate expanded before X


def test_iteration_budget_respected():
    def expand(s):
        # endless chain
        return {"reactants": [s + "x"], "scores": [0.5],
                "templates": ["t"], "analysis": None}

    succ, route, iters = retro_star_search(
        "T", set(), expand, _value_zero, iterations=7)
    assert not succ
    assert iters == 7
