"""Randomized planner invariants: on random reaction tables, a route
returned as success must be chemically consistent (every reaction in
the table, every leaf purchasable), the multi-target search must agree
with independent single-target searches on success, and budgets hold."""

import numpy as np

from llamole_tpu.planner import retro_star_search, retro_star_search_multi


def _random_table(rng, n_mols=12, known_frac=0.4):
    """A random retro 'universe': molecules M0..Mn, random one-step
    disconnections pointing at strictly-higher indices (acyclic), a
    random subset of high-index molecules purchasable."""
    names = [f"M{i}" for i in range(n_mols)]
    known = {n for n in names[n_mols // 2:] if rng.random() < known_frac}
    table = {}
    for i, name in enumerate(names):
        if name in known or i == n_mols - 1:
            table[name] = None
            continue
        if rng.random() < 0.25:
            table[name] = None   # dead end
            continue
        n_opts = int(rng.integers(1, 4))
        reactants, scores, templates = [], [], []
        for k in range(n_opts):
            n_parts = int(rng.integers(1, 3))
            parts = sorted(rng.choice(np.arange(i + 1, n_mols),
                                      size=min(n_parts, n_mols - i - 1),
                                      replace=False).tolist())
            reactants.append(".".join(names[p] for p in parts))
            scores.append(float(rng.uniform(0.1, 0.99)))
            templates.append(f"t{i}_{k}")
        table[name] = {"reactants": reactants, "scores": scores,
                       "templates": templates, "analysis": None}
    return names, known, table


def _route_is_consistent(route, table, known):
    reactions, templates, costs = route.get_reaction_list()[:3] \
        if isinstance(route.get_reaction_list(), tuple) \
        else (route.get_reaction_list(), None, None)
    produced = set()
    consumed = []
    for rxn in reactions:
        prod, rhs = rxn.split(">>")
        entry = table.get(prod)
        assert entry is not None, f"route uses dead-end product {prod}"
        # the route may reorder reactants within the dot-join
        options = {tuple(sorted(r.split("."))) for r in entry["reactants"]}
        assert tuple(sorted(rhs.split("."))) in options, \
            f"{rxn} not a table option"
        produced.add(prod)
        consumed.extend(rhs.split("."))
    # every consumed molecule is either purchasable or itself produced
    for mol in consumed:
        assert mol in known or mol in produced, f"leaf {mol} unknown"
    return True


def test_random_tables_single_vs_multi_and_route_validity():
    rng = np.random.default_rng(123)
    agree = solved = 0
    for trial in range(200):
        names, known, table = _random_table(rng)
        targets = [n for n in names[:3] if n not in known]
        if not targets:
            continue

        def expand(s):
            return table.get(s)

        def batch_expand(items):
            # multi-search items are (target, smiles) pairs
            return [table.get(s) for _t, s in items]

        def value_fn(s, parent):
            return 0.0

        singles = {}
        for t in targets:
            succ, route, used = retro_star_search(
                t, known, expand, value_fn, iterations=40)
            assert used <= 40
            if succ:
                solved += 1
                assert _route_is_consistent(route, table, known)
            singles[t] = succ

        multi = retro_star_search_multi(
            targets, known, batch_expand, value_fn,
            iterations=40, total_width=3)
        for t in targets:
            succ, route, _used = multi[t]
            assert succ == singles[t], (trial, t)
            if succ:
                assert _route_is_consistent(route, table, known)
            agree += 1
    assert solved > 30, f"only {solved} solved — table generator too harsh"
    assert agree > 100
