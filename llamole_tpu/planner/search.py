"""Retro*-style best-first AND-OR search
(parity: src/model/planner/molstar.py:9-76, mol_tree.py:10-129).

Dependency-injected exactly like the reference: expand_fn(smiles) ->
{"reactants": [..], "scores": [..], "templates": [..], "analysis": ..}
and value_fn(smiles, parent_reaction) -> float. The composite model
supplies both; unit tests use fakes (the one mockable seam, SURVEY §4d).
"""

import math
import time
from collections import deque
from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..utils.logging import get_logger
from .nodes import INF, MoleculeNode, ReactionNode
from .route import SynthesisRoute

logger = get_logger(__name__)


class SearchTree:
    def __init__(self, target: str, known_mols, value_fn,
                 zero_known_value: bool = True):
        self.target = target
        self.known_mols = known_mols
        self.value_fn = value_fn
        self.zero_known_value = zero_known_value
        self.mol_nodes: List[MoleculeNode] = []
        self.reaction_nodes: List[ReactionNode] = []
        self.search_status = 0.0
        self.root = self._add_mol(target, None)
        self.succ = self.root.succ and False  # target-in-stock still searches
        if target in known_mols:
            logger.info("target is already purchasable; searching for a route anyway")

    def _add_mol(self, smiles: str, parent: Optional[ReactionNode]) -> MoleculeNode:
        node = MoleculeNode(
            smiles,
            init_value=self.value_fn(smiles, parent),
            parent=parent,
            is_known=smiles in self.known_mols,
            zero_known_value=self.zero_known_value)
        self.mol_nodes.append(node)
        node.id = len(self.mol_nodes)
        return node

    def next_open(self) -> Optional[MoleculeNode]:
        best, best_v = None, INF
        for m in self.mol_nodes:
            if m.open:
                v = m.v_target()
                if v < best_v:
                    best, best_v = m, v
        if best is not None:
            self.search_status = best_v
        return best

    def expand(self, node: MoleculeNode,
               reactant_lists: Optional[Sequence[Sequence[str]]],
               costs: Optional[Sequence[float]],
               templates: Optional[Sequence[Optional[str]]],
               analysis) -> bool:
        assert not node.is_known and not node.children
        if costs is None:  # expansion produced nothing
            node.init_values(no_child=True)
            if node.parent:
                node.parent.backup(INF, exclude_mol=node.smiles)
            return self.succ

        ancestors = node.ancestor_smiles()
        for cost, reactants, template in zip(costs, reactant_lists, templates):
            assert cost >= 0
            if any(r in ancestors for r in reactants):
                continue  # cycle
            rxn = ReactionNode(node, float(cost), template, analysis)
            for r in reactants:
                self._add_mol(r, rxn)
            rxn.init_values()
            self.reaction_nodes.append(rxn)
            rxn.id = len(self.reaction_nodes)

        if not node.children:
            node.init_values(no_child=True)
            if node.parent:
                node.parent.backup(INF, exclude_mol=node.smiles)
            return self.succ

        delta = node.init_values()
        if node.parent:
            node.parent.backup(delta, exclude_mol=node.smiles)
        if not self.succ and self.root.succ:
            logger.info("synthesis route found for %s", self.target)
            self.succ = True
        return self.succ

    def best_route(self) -> Optional[SynthesisRoute]:
        if not self.succ:
            return None
        route = SynthesisRoute(self.root.smiles, self.root.succ_value,
                               self.search_status)
        queue = deque([self.root])
        while queue:
            mol = queue.popleft()
            if mol.is_known:
                route.set_value(mol.smiles, mol.succ_value)
                continue
            best = None
            for rxn in mol.children:
                if rxn.succ and (best is None or rxn.succ_value < best.succ_value):
                    best = rxn
            assert best is not None and best.succ_value == mol.succ_value
            reactants = [c.smiles for c in best.children]
            queue.extend(best.children)
            route.add_reaction(mol.smiles, mol.succ_value, best.template,
                               best.analysis_tokens, reactants, best.cost)
        return route


def retro_star_search(
    target_smiles: str,
    known_mols,
    expand_fn: Callable[[str], Optional[Dict]],
    value_fn: Callable[[str, Optional[ReactionNode]], float],
    iterations: int = 100,
    max_time: float = 300.0,
) -> Tuple[bool, Optional[SynthesisRoute], int]:
    """Returns (success, best_route, iterations_used)."""
    tree = SearchTree(target_smiles, known_mols, value_fn)
    start = time.time()
    used = 0
    if not tree.succ:
        for used in range(1, iterations + 1):
            if time.time() - start > max_time:
                break
            node = tree.next_open()
            if node is None:
                break

            result = expand_fn(node.smiles)
            if result is not None and len(result.get("scores", [])) > 0:
                scores = np.asarray(result["scores"], dtype=np.float64)
                costs = -np.log(np.clip(scores, 1e-3, 1.0))
                reactant_lists = [sorted(set(r.split(".")))
                                  for r in result["reactants"]]
                done = tree.expand(node, reactant_lists, costs.tolist(),
                                   result["templates"], result["analysis"])
                if done:
                    break
                if tree.root.succ_value <= tree.search_status:
                    break  # proven optimal
            else:
                tree.expand(node, None, None, None, None)

    route = tree.best_route() if tree.succ else None
    return tree.succ, route, used


# reference-compatible alias (molstar.py:9 signature)
def molstar(target_mol, target_mol_id, starting_mols, expand_fn, value_fn,
            iterations, viz=False, viz_dir=None, max_time=300):
    return retro_star_search(target_mol, starting_mols, expand_fn, value_fn,
                             iterations=iterations, max_time=max_time)
