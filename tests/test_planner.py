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


# ---------------------------------------------------------------------------
# cross-target interleaved search (retro_star_search_multi)
# ---------------------------------------------------------------------------

def _multi_expand_table(table):
    calls = {"batches": 0, "items": []}

    def batch_expand(items):
        calls["batches"] += 1
        calls["items"].append(list(items))
        return [table.get(s) for _, s in items]

    return batch_expand, calls


def test_multi_search_matches_individual_searches():
    """Independent targets solved in one interleaved run produce the
    same routes as individual searches."""
    from llamole_tpu.planner import retro_star_search_multi

    table = {
        "T1": {"reactants": ["A.B"], "scores": [0.9],
               "templates": ["t1"], "analysis": None},
        "T2": {"reactants": ["X"], "scores": [0.8],
               "templates": ["t2"], "analysis": None},
        "X": {"reactants": ["A.C"], "scores": [0.7],
              "templates": ["tx"], "analysis": None},
        "T3": None,  # dead end
    }
    known = {"A", "B", "C"}
    batch_expand, calls = _multi_expand_table(table)
    res = retro_star_search_multi(
        ["T1", "T2", "T3"], known, batch_expand, _value_zero,
        iterations=10, total_width=4)
    assert res["T1"][0] and res["T2"][0] and not res["T3"][0]
    r1, *_ = res["T1"][1].get_reaction_list()
    assert r1 == ["T1>>A.B"]
    r2, *_ = res["T2"][1].get_reaction_list()
    assert r2 == ["T2>>X", "X>>A.C"]
    # the first batch must interleave all three targets' roots
    first = {t for t, _ in calls["items"][0]}
    assert first == {"T1", "T2", "T3"}


def test_multi_search_dedups_targets_and_shares_value_cache():
    from llamole_tpu.planner import retro_star_search_multi

    table = {"T": {"reactants": ["A.B"], "scores": [0.9],
                   "templates": ["t"], "analysis": None}}
    batch_expand, calls = _multi_expand_table(table)
    value_calls = []

    def batch_value(smiles):
        value_calls.append(list(smiles))
        return [0.5] * len(smiles)

    res = retro_star_search_multi(
        ["T", "T", "T"], {"A", "B"}, batch_expand, _value_zero,
        iterations=5, batch_value_fn=batch_value)
    assert set(res) == {"T"}
    assert res["T"][0]
    assert calls["batches"] == 1  # one tree, one expansion


def test_multi_search_iteration_cap_per_tree():
    """An unsolvable target burns its own cap without blocking others."""
    from llamole_tpu.planner import retro_star_search_multi

    def endless(items):
        out = []
        for _, s in items:
            # every expansion proposes a fresh unknown molecule
            out.append({"reactants": [s + "x"], "scores": [0.5],
                        "templates": ["t"], "analysis": None})
        return out

    table = {"S": {"reactants": ["A"], "scores": [0.9],
                   "templates": ["t"], "analysis": None}}

    def mixed(items):
        return [table[s] if s in table else endless([(t, s)])[0]
                for t, s in items]

    res = retro_star_search_multi(
        ["DEEP", "S"], {"A"}, mixed, _value_zero,
        iterations=4, total_width=4)
    assert res["S"][0]
    assert not res["DEEP"][0]
    assert res["DEEP"][2] <= 4  # per-tree cap respected


def test_multi_search_respects_total_width_cap():
    """total_width bounds the device batch even with more active trees;
    least-served trees get the slots, round-robining across rounds."""
    from llamole_tpu.planner import retro_star_search_multi

    sizes = []

    def batch_expand(items):
        sizes.append(len(items))
        return [{"reactants": [s + "x"], "scores": [0.5],
                 "templates": ["t"], "analysis": None} for _, s in items]

    targets = [f"T{i}" for i in range(10)]
    res = retro_star_search_multi(
        targets, {"A"}, batch_expand, _value_zero,
        iterations=3, total_width=4)
    assert sizes and max(sizes) <= 4, sizes
    # every tree got served (round-robin fairness)
    assert all(res[t][2] >= 1 for t in targets)


def test_multi_search_prescored_roots_in_one_batch():
    """Root values come from ONE batch_value_fn call, not a sequential
    value_fn forward per target."""
    from llamole_tpu.planner import retro_star_search_multi

    value_fn_calls = []

    def value_fn(s, parent):
        value_fn_calls.append(s)
        return 0.0

    batch_calls = []

    def batch_value(smiles):
        batch_calls.append(list(smiles))
        return [0.1] * len(smiles)

    def batch_expand(items):
        return [None] * len(items)   # dead ends: only roots get valued

    targets = ["T1", "T2", "T3"]
    retro_star_search_multi(targets, {"A"}, batch_expand, value_fn,
                            iterations=2, batch_value_fn=batch_value)
    assert batch_calls and set(batch_calls[0]) == set(targets)
    assert value_fn_calls == []  # cache hits; no per-root device calls


def test_multi_search_effort_floor_overtime():
    """min_iters_per_target: trees the shared wall starved keep running
    in overtime until each has its floor of expansions (VERDICT r4 #5),
    and overtime rounds serve ONLY the lagging trees."""
    import time as _time
    from llamole_tpu.planner import retro_star_search_multi

    served = []

    def batch_expand(items):
        served.append(sorted({t for t, _ in items}))
        _time.sleep(0.02)  # every round lands past the 0-second wall
        return [{"reactants": [s + "x"], "scores": [0.5],
                 "templates": ["t"], "analysis": None} for _, s in items]

    targets = [f"T{i}" for i in range(4)]
    res = retro_star_search_multi(
        targets, {"A"}, batch_expand, _value_zero,
        iterations=10, total_width=2,   # width 2 < 4 trees: starvation
        max_time=0.0,                   # wall expires immediately
        min_iters_per_target=3, max_time_hard=60.0)
    for t in targets:
        assert res[t][2] >= 3, (t, res[t][2])
    # the final rounds must not re-serve trees already at the floor
    last_round = served[-1]
    assert len(last_round) <= 2


def test_multi_search_effort_floor_hard_cap():
    """Overtime is bounded: a slow engine stops at max_time_hard even
    when the floor was never reached."""
    import time as _time
    from llamole_tpu.planner import retro_star_search_multi

    def slow_expand(items):
        _time.sleep(0.15)
        return [{"reactants": [s + "x"], "scores": [0.5],
                 "templates": ["t"], "analysis": None} for _, s in items]

    t0 = _time.time()
    res = retro_star_search_multi(
        ["T0", "T1"], {"A"}, slow_expand, _value_zero,
        iterations=1000, total_width=1,
        max_time=0.0, min_iters_per_target=1000, max_time_hard=0.5)
    assert _time.time() - t0 < 5.0
    assert all(res[t][2] < 1000 for t in ("T0", "T1"))


def test_multi_search_no_floor_keeps_wall_semantics():
    """min_iters_per_target=0 (default): the wall still breaks the loop
    immediately — pre-floor behavior unchanged."""
    import time as _time
    from llamole_tpu.planner import retro_star_search_multi

    calls = []

    def batch_expand(items):
        calls.append(len(items))
        _time.sleep(0.05)
        return [{"reactants": [s + "x"], "scores": [0.5],
                 "templates": ["t"], "analysis": None} for _, s in items]

    res = retro_star_search_multi(
        ["T0", "T1"], {"A"}, batch_expand, _value_zero,
        iterations=100, total_width=4, max_time=0.0)
    # one round at most (the first wall check precedes any expansion;
    # the implementation breaks before round 1 at max_time=0)
    assert sum(r[2] for r in res.values()) <= 2
