"""chemkit native library tests: bit-identical outputs vs the Python
reference implementations, across the MolQA example corpus."""

import json
import re

import numpy as np
import pytest

from llamole_tpu.chem import _native
from llamole_tpu.chem.fingerprint import morgan_fingerprint
from llamole_tpu.chem.smiles import canonical_ranks, mol_to_smiles, parse_smiles

native_available = _native.available()

pytestmark = pytest.mark.skipif(
    not native_available, reason="chemkit native library unavailable")

CORPUS = [
    "CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "O=[N+]([O-])c1ccccc1",
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "*CC(*)c1ccccc1", "[NH4+]",
    "CNc1nccn2c(Br)cnc12", "c1ccc2ccccc2c1", "C1CCCCC1", "[O-]c1ccccc1",
]


@pytest.mark.parametrize("smi", CORPUS)
def test_ranks_match_python(smi):
    mol = parse_smiles(smi)
    native = canonical_ranks(mol, use_native=True)
    python = canonical_ranks(mol, use_native=False)
    assert native == python, smi


@pytest.mark.parametrize("smi", CORPUS)
def test_morgan_match_python(smi):
    native = morgan_fingerprint(smi, use_native=True)
    python = morgan_fingerprint(smi, use_native=False)
    assert (native == python).all(), smi


def test_canonical_smiles_stable_under_native():
    for smi in CORPUS:
        mol = parse_smiles(smi)
        assert mol_to_smiles(mol) == mol_to_smiles(mol)


def test_corpus_roundtrip_with_native():
    with open("/root/reference/data/molqa_drug_examples.json") as f:
        records = json.load(f)
    smiles = set()
    for r in records:
        smiles.update(re.findall(r"<mol_start>(.*?)<mol_end>", r["output"]))
    for s in smiles:
        mol = parse_smiles(s)
        assert canonical_ranks(mol, use_native=True) == \
            canonical_ranks(mol, use_native=False), s


# ---------------------------------------------------------------------------
# SMARTS matcher parity: native ck_match_component must reproduce the
# Python match_component exactly — same embeddings, same enumeration
# order, same max_matches cutoff.
# ---------------------------------------------------------------------------

from llamole_tpu.chem import smarts as _smarts  # noqa: E402

MATCH_PATTERNS = [
    "[C:1](=[O:2])-[O:3]-[C:4]",
    "Cl-[C;H0;D3;+0:4](-[#8:5])=[O;D1;H0:6]",
    "[#16;a:6]:[c:7](:[#7;a:8])-[NH2;D1;+0:9]",
    "[C;D1;H3:4]-[NH;D2;+0:5]-[c:6]",
    "O-B(-O)-[c;H0;D3;+0:7]1:[c:8]:[cH;D2;+0:9]:c:[s;H0;D2;+0:10]:1",
    "[c;r5]", "[C;R2]", "[n;H1]", "c1ccccc1", "[O;D1]", "[N;+1]",
    "[C!H0]", "[CX4]", "[#6;a,A]", "[*]~[*]", "C=C", "[C]@[C]",
    "[cH0]", "[c;H1,H0]", "[!C;!N]", "[R]", "[r6]", "[C](=[O])[O;H1]",
]

MATCH_MOLS = [
    "CC(=O)OCC", "CC(=O)NC", "CN(C)c1ccccc1", "c1ccc2ccccc2c1",
    "OB(O)c1ccc(s1)C", "Nc1ncc(s1)C", "c1ccoc1", "C1CC2CCC1CC2",
    "O=C(Cl)c1ccccc1", "[NH4+].[Cl-]", "OC(=O)c1ccncc1",
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",
]


@pytest.mark.parametrize("pattern", MATCH_PATTERNS)
def test_match_component_parity(pattern):
    comps = _smarts.parse_smarts(pattern)
    for qm in comps:
        for smi in MATCH_MOLS:
            mol = parse_smiles(smi)
            ref = _smarts.match_component(qm, mol, use_native=False)
            nat = _smarts.match_component(qm, mol, use_native=True)
            assert nat == ref, (pattern, smi)


def test_match_component_max_matches_parity():
    qm = _smarts.parse_smarts("[cH]")[0]
    mol = parse_smiles("c1ccccc1-c1ccccc1")
    for mm in (1, 2, 3, 5, 64):
        ref = _smarts.match_component(qm, mol, max_matches=mm,
                                      use_native=False)
        nat = _smarts.match_component(qm, mol, max_matches=mm,
                                      use_native=True)
        assert nat == ref, mm


def test_match_cache_invalidated_on_edit():
    # the serialized-mol memo must not survive structural edits
    from llamole_tpu.chem.mol import Atom
    qm = _smarts.parse_smarts("[OH]")[0]
    mol = parse_smiles("CCO")
    first = _smarts.match_component(qm, mol, use_native=True)
    assert len(first) == 1
    i = mol.add_atom(Atom(8))
    mol.add_bond(0, i)
    again = _smarts.match_component(qm, mol, use_native=True)
    ref = _smarts.match_component(qm, mol, use_native=False)
    assert again == ref and len(again) == 2


# ---------------------------------------------------------------------------
# SSSR parity: native ck_sssr must reproduce Mol.smallest_rings' Python
# path exactly (same rings, same order, same atom order within a ring).
# ---------------------------------------------------------------------------

SSSR_CORPUS = [
    "CC(=O)Oc1ccccc1C(=O)O", "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",
    "c1ccc2ccccc2c1", "C1CC2CCC1CC2", "C1=CC2=CC=CC2=C1",
    "c1ccc2c(c1)ccc1ccccc12", "C12C3C4C1C5C2C3C45",
    "c1cc2ccc3cccc4ccc(c1)c2c34", "C1CCC2(CC1)CCCCC2",
    "N1C2CC3CC1CC(C2)C3", "C1OC1c1ccccc1",
]


def _python_sssr(mol):
    from llamole_tpu.chem import _native as nat
    mol._sssr_cache = None
    orig = nat.sssr
    nat.sssr = lambda m, t: None
    try:
        return mol.smallest_rings()
    finally:
        nat.sssr = orig
        mol._sssr_cache = None


@pytest.mark.parametrize("smi", SSSR_CORPUS)
def test_sssr_parity(smi):
    mol = parse_smiles(smi)
    ref = _python_sssr(mol)
    nat = mol.smallest_rings()
    assert nat == ref, smi


def test_sssr_parity_random_graphs():
    from llamole_tpu.chem.mol import Atom, Mol
    rng = np.random.default_rng(11)
    for trial in range(120):
        n = int(rng.integers(3, 16))
        mol = Mol()
        for _ in range(n):
            mol.add_atom(Atom(6))
        for _ in range(int(rng.integers(2, n * 2))):
            a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
            if a != b and b not in mol._adj[a]:
                mol.add_bond(a, b)
        # scramble adjacency insertion order vs bond index order
        if mol.n_bonds() > 1 and trial % 3 == 0:
            b = mol.bonds[int(rng.integers(0, mol.n_bonds()))]
            mol.remove_bond(b.a1, b.a2)
        ref = _python_sssr(mol)
        nat = mol.smallest_rings()
        assert nat == ref, trial
