"""Molecular graph containers.

A ``Mol`` is a mutable graph of ``Atom``s and ``Bond``s with O(1)
neighbor lookup. Bond orders are integers 1/2/3; aromatic bonds carry
``aromatic=True`` (order treated as 1.5 for valence accounting), which
matches the reference's edge-class scheme {1,2,3,4=aromatic}
(constants.py:24 BOND_INDEX).
"""

from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional, Set, Tuple

from .periodic import Z_TO_SYMBOL, default_valences


@dataclass
class Atom:
    z: int                      # atomic number; 0 = wildcard '*'
    charge: int = 0
    explicit_hs: Optional[int] = None  # None => implicit from valence model
    aromatic: bool = False
    isotope: int = 0
    atom_map: int = 0           # SMILES atom-map class (templates)

    @property
    def symbol(self) -> str:
        return Z_TO_SYMBOL.get(self.z, "?")

    def copy(self) -> "Atom":
        return Atom(self.z, self.charge, self.explicit_hs, self.aromatic,
                    self.isotope, self.atom_map)


@dataclass
class Bond:
    a1: int
    a2: int
    order: int = 1              # 1, 2, 3
    aromatic: bool = False

    def other(self, idx: int) -> int:
        return self.a2 if idx == self.a1 else self.a1

    def copy(self) -> "Bond":
        return Bond(self.a1, self.a2, self.order, self.aromatic)

    @property
    def edge_class(self) -> int:
        """Edge class per BOND_INDEX: aromatic=4, else order."""
        return 4 if self.aromatic else self.order

    def valence_contrib(self) -> float:
        return 1.5 if self.aromatic else float(self.order)


class Mol:
    """Small mutable molecular graph."""

    def __init__(self):
        self.atoms: List[Atom] = []
        self.bonds: List[Bond] = []
        self._adj: List[Dict[int, int]] = []  # atom idx -> {nbr: bond idx}

    # -- construction ----------------------------------------------------
    def add_atom(self, atom: Atom) -> int:
        self.atoms.append(atom)
        self._adj.append({})
        return len(self.atoms) - 1

    def add_bond(self, a1: int, a2: int, order: int = 1, aromatic: bool = False) -> int:
        if a1 == a2:
            raise ValueError("self-bond")
        if a2 in self._adj[a1]:
            raise ValueError(f"duplicate bond {a1}-{a2}")
        bond = Bond(a1, a2, order, aromatic)
        self.bonds.append(bond)
        idx = len(self.bonds) - 1
        self._adj[a1][a2] = idx
        self._adj[a2][a1] = idx
        return idx

    def remove_bond(self, a1: int, a2: int) -> None:
        idx = self._adj[a1].pop(a2, None)
        if idx is None:
            raise ValueError(f"no bond {a1}-{a2}")
        self._adj[a2].pop(a1)
        # swap-remove, fixing adjacency of the moved bond
        last = len(self.bonds) - 1
        if idx != last:
            moved = self.bonds[last]
            self.bonds[idx] = moved
            self._adj[moved.a1][moved.a2] = idx
            self._adj[moved.a2][moved.a1] = idx
        self.bonds.pop()

    # -- queries ----------------------------------------------------------
    def n_atoms(self) -> int:
        return len(self.atoms)

    def n_bonds(self) -> int:
        return len(self.bonds)

    def neighbors(self, idx: int) -> List[int]:
        return list(self._adj[idx].keys())

    def bond_between(self, a1: int, a2: int) -> Optional[Bond]:
        idx = self._adj[a1].get(a2)
        return None if idx is None else self.bonds[idx]

    def bonds_of(self, idx: int) -> List[Bond]:
        return [self.bonds[i] for i in self._adj[idx].values()]

    def degree(self, idx: int) -> int:
        return len(self._adj[idx])

    def bond_order_sum(self, idx: int) -> float:
        return sum(b.valence_contrib() for b in self.bonds_of(idx))

    def implicit_hs(self, idx: int) -> int:
        """Hydrogens implied by the valence model (0 if explicit or unknown)."""
        atom = self.atoms[idx]
        if atom.explicit_hs is not None:
            return atom.explicit_hs
        if atom.z == 0:
            return 0
        allowed = default_valences(atom.z, atom.charge)
        if allowed is None:
            return 0
        import math
        bos = self.bond_order_sum(idx)
        bos_ceil = int(math.ceil(bos - 1e-9))
        for v in allowed:
            if v >= bos_ceil:
                return v - bos_ceil
        return 0

    def total_hs(self, idx: int) -> int:
        return self.implicit_hs(idx)

    def copy(self) -> "Mol":
        m = Mol()
        for a in self.atoms:
            m.add_atom(a.copy())
        for b in self.bonds:
            m.add_bond(b.a1, b.a2, b.order, b.aromatic)
        return m

    # -- fragments ---------------------------------------------------------
    def fragments(self) -> List[List[int]]:
        """Connected components as lists of atom indices."""
        seen: Set[int] = set()
        comps = []
        for start in range(self.n_atoms()):
            if start in seen:
                continue
            stack, comp = [start], []
            seen.add(start)
            while stack:
                v = stack.pop()
                comp.append(v)
                for w in self._adj[v]:
                    if w not in seen:
                        seen.add(w)
                        stack.append(w)
            comps.append(sorted(comp))
        return comps

    def subgraph(self, atom_indices: Iterable[int]) -> "Mol":
        keep = list(atom_indices)
        remap = {old: new for new, old in enumerate(keep)}
        m = Mol()
        for old in keep:
            m.add_atom(self.atoms[old].copy())
        for b in self.bonds:
            if b.a1 in remap and b.a2 in remap:
                m.add_bond(remap[b.a1], remap[b.a2], b.order, b.aromatic)
        return m

    # -- rings --------------------------------------------------------------
    def ring_info(self) -> List[List[int]]:
        """A cycle basis as atom-index rings (small molecules: fine SSSR proxy).

        Uses recursion-ordered DFS (iterator stack) so every non-tree edge
        is a back edge to an ancestor; each back edge yields one ring by
        walking parent pointers.
        """
        rings: List[List[int]] = []
        n = self.n_atoms()
        parent = [-1] * n
        depth = [-1] * n
        for root in range(n):
            if depth[root] != -1:
                continue
            depth[root] = 0
            it_stack = [(root, -1, iter(self._adj[root].items()))]
            while it_stack:
                v, pe, it = it_stack[-1]
                advanced = False
                for w, bidx in it:
                    if bidx == pe:
                        continue
                    if depth[w] == -1:
                        depth[w] = depth[v] + 1
                        parent[w] = v
                        it_stack.append((w, bidx, iter(self._adj[w].items())))
                        advanced = True
                        break
                    elif depth[w] < depth[v]:
                        ring = []
                        x = v
                        while x != w:
                            ring.append(x)
                            x = parent[x]
                        ring.append(w)
                        rings.append(ring)
                if not advanced:
                    it_stack.pop()
        return rings

    def smallest_rings(self) -> List[List[int]]:
        """Smallest ring through each ring bond (SSSR-like set of rings)."""
        bridges = self._find_bridges()
        seen = set()
        rings: List[List[int]] = []
        for bi, b in enumerate(self.bonds):
            if bi in bridges:
                continue
            ring = self._shortest_cycle_through(bi)
            if ring is None:
                continue
            key = tuple(sorted(ring))
            if key not in seen:
                seen.add(key)
                rings.append(ring)
        return rings

    def _shortest_cycle_through(self, bond_idx: int) -> Optional[List[int]]:
        """BFS shortest path a1->a2 avoiding the bond itself."""
        from collections import deque

        b = self.bonds[bond_idx]
        src, dst = b.a1, b.a2
        prev = {src: -1}
        q = deque([src])
        while q:
            v = q.popleft()
            if v == dst:
                break
            for w, bi in self._adj[v].items():
                if bi == bond_idx or w in prev:
                    continue
                prev[w] = v
                q.append(w)
        if dst not in prev:
            return None
        path = [dst]
        x = prev[dst]
        while x != -1:
            path.append(x)
            x = prev[x]
        return path

    def ring_membership(self) -> List[bool]:
        """True for atoms on any cycle: atoms on non-bridge edges."""
        in_ring = [False] * self.n_atoms()
        bridges = self._find_bridges()
        for i, b in enumerate(self.bonds):
            if i not in bridges:
                in_ring[b.a1] = True
                in_ring[b.a2] = True
        return in_ring

    def ring_bond_membership(self) -> List[bool]:
        """True for bonds on any cycle (non-bridge edges)."""
        bridges = self._find_bridges()
        return [i not in bridges for i in range(self.n_bonds())]

    def _find_bridges(self) -> Set[int]:
        n = self.n_atoms()
        disc = [-1] * n
        low = [0] * n
        timer = [0]
        bridges: Set[int] = set()
        for root in range(n):
            if disc[root] != -1:
                continue
            disc[root] = low[root] = timer[0]; timer[0] += 1
            it_stack = [(root, -1, iter(self._adj[root].items()))]
            while it_stack:
                v, pe, it = it_stack[-1]
                advanced = False
                for w, bidx in it:
                    if bidx == pe:
                        continue
                    if disc[w] == -1:
                        disc[w] = low[w] = timer[0]; timer[0] += 1
                        it_stack.append((w, bidx, iter(self._adj[w].items())))
                        advanced = True
                        break
                    else:
                        low[v] = min(low[v], disc[w])
                if not advanced:
                    it_stack.pop()
                    if it_stack:
                        u = it_stack[-1][0]
                        low[u] = min(low[u], low[v])
                        if low[v] > disc[u]:
                            bridges.add(pe)
        return bridges
