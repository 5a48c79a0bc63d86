"""Fuzz tests: random dense graphs through the assembly/correction
cascade, and random SMILES-ish strings through the parser — the public
chem APIs must never raise."""

import numpy as np
import pytest

from llamole_tpu.chem.assemble import check_valid, graph_to_smiles
from llamole_tpu.chem.featurize import smiles_to_graph
from llamole_tpu.chem.periodic import Z_TO_SYMBOL
from llamole_tpu.chem.smiles import canonical_smiles
from llamole_tpu.utils.constants import ATOM_TYPE_OFFSET, WILDCARD_ATOM_TYPE

DECODER = {i: Z_TO_SYMBOL.get(i + ATOM_TYPE_OFFSET, "*") for i in range(118)}
DECODER[WILDCARD_ATOM_TYPE] = "*"


class _Dec:
    def __getitem__(self, i):
        return DECODER[int(i)]


def test_random_graphs_never_crash():
    rng = np.random.default_rng(0)
    common_atoms = [4, 5, 6, 7, 13, 14, 15, 33, 51]  # C N O F P S Cl Br I codes
    ok = none = 0
    for trial in range(60):
        n = int(rng.integers(1, 14))
        atoms = rng.choice(common_atoms, size=n)
        edges = rng.integers(0, 5, (n, n)) * (rng.random((n, n)) < 0.3)
        edges = np.triu(edges, 1)
        edges = edges + edges.T
        out = graph_to_smiles([(atoms, edges.astype(np.int32))], _Dec())[0]
        if out is None:
            none += 1
        else:
            ok += 1
            # whatever comes out must itself be valid + round-trippable
            assert check_valid(out), out
            assert smiles_to_graph(out) is not None, out
    assert ok > 0, "correction cascade never produced a valid molecule"


def test_random_strings_never_crash():
    rng = np.random.default_rng(1)
    alphabet = list("CNOSPcnos()[]=#123+-*@/\\FIBrlH%")
    for trial in range(200):
        length = int(rng.integers(1, 25))
        s = "".join(rng.choice(alphabet, size=length))
        result = canonical_smiles(s)  # None or a string; never an exception
        if result is not None:
            assert canonical_smiles(result) == result, s


def test_mutated_corpus_never_crashes():
    base = "CC(=O)Oc1ccccc1C(=O)O"
    rng = np.random.default_rng(2)
    for trial in range(100):
        s = list(base)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(s)))
            s[pos] = chr(int(rng.integers(33, 126)))
        canonical_smiles("".join(s))


def test_random_stereo_decorations_roundtrip():
    """Random @/@@ + / \\ decorations on real scaffolds: parse must never
    raise, and anything that canonicalizes must be stable + permutation
    invariant."""
    from llamole_tpu.chem.smiles import mol_to_smiles, parse_smiles

    scaffolds = [
        "NC(C)C(=O)O", "CC(F)C(Cl)C", "CC=CC", "CC=CC=CC", "OC1CCC(N)CC1",
        "CC(N)C1CCC(O)CC1", "FC=C(C)C(=O)O",
    ]
    rng = np.random.default_rng(3)
    checked = 0
    for trial in range(120):
        base = scaffolds[trial % len(scaffolds)]
        s = []
        for ch in base:
            if ch == "(" and rng.random() < 0.3:
                s.append("(" + ("/" if rng.random() < 0.5 else "\\"))
                continue
            if ch == "C" and rng.random() < 0.3:
                s.append("[C@H]" if rng.random() < 0.5 else "[C@@H]")
                continue
            if ch == "=" and rng.random() < 0.3:
                s.append("/=" [0])  # stray slash before the double bond
                s.append("=")
                continue
            s.append(ch)
        smi = "".join(s)
        c1 = canonical_smiles(smi)  # None or string, never an exception
        if c1 is None:
            continue
        checked += 1
        assert canonical_smiles(c1) == c1, (smi, c1)
        mol = parse_smiles(c1)
        perm = list(np.random.default_rng(trial).permutation(mol.n_atoms()))
        assert mol_to_smiles(mol.subgraph(perm)) == c1, (smi, c1)
    assert checked > 20, f"only {checked} decorated strings parsed"


def test_kekule_input_aromatic_h_round_trip():
    """Pyrrole-type H survives aromatization from KEKULÉ input: the
    perception pins explicit_hs for N/P so the written [nH]/[pH] form
    re-parses (pre-fix, C1=CC=CN1 canonicalized to c1ccnc1 — which
    failed to kekulize back). Cross-spelling consistency: the kekulé
    and aromatic spellings of the same molecule must canonicalize
    identically (the canonicalization-boundary dedup depends on it)."""
    pairs = [
        ("C1=CC=CN1", "c1cc[nH]c1"),          # pyrrole
        ("C1=CC=CP1", None),                    # phosphole
        ("N1C=CC2=CC=CC=C12", "c1ccc2[nH]ccc2c1"),  # indole
        ("C1=CC=NC=C1", "c1ccncc1"),           # pyridine (no H to pin)
        ("C1=CC=C[NH+]=C1", "c1cc[nH+]cc1"),   # pyridinium
    ]
    for kek, arom in pairs:
        c1 = canonical_smiles(kek)
        assert c1 is not None, kek
        assert canonical_smiles(c1) == c1, (kek, c1)
        if arom is not None:
            assert canonical_smiles(arom) == c1, (kek, arom, c1)


def test_unkekulizable_aromatic_perception_rolls_back():
    """A ring Hückel accepts but the parser's donor rules cannot
    re-kekulize (exotic heteroaromatics) must keep its kekulé spelling
    — the written form always re-parses."""
    s = "C1=[O+]SNPP=P1NP"
    c1 = canonical_smiles(s)
    assert c1 is not None
    assert canonical_smiles(c1) == c1, c1   # stable fixed point
    # and the aromatizable bare ring still writes aromatic + stable
    ring = canonical_smiles("C1=[O+]SNPP=P1")
    assert ring is not None and canonical_smiles(ring) == ring


def test_fused_aromatic_fixed_points():
    """Fused polycyclics incl. nonalternants (azulene, indolizine,
    acenaphthylene, pyrene): parse -> canonical -> parse must be a fixed
    point, and kekulized/aromatic spellings of the same molecule must
    collapse to one canonical form (VERDICT r2 item 4; the reference
    gets this implicitly from Chem.MolFromSmiles,
    molecule_utils.py:30-35)."""
    spelling_pairs = [
        ("C1=CC2=CC=CC2=CC=C1", "c1ccc2cccc2cc1"),   # azulene (10pi)
        ("C1=CN2C=CC=CC2=C1", "c1ccn2cccc2c1"),      # indolizine
    ]
    for kek, arom in spelling_pairs:
        c = canonical_smiles(kek)
        assert c is not None and "=" not in c, (kek, c)
        assert canonical_smiles(arom) == c
        assert canonical_smiles(c) == c

    fused = [
        "C1=Cc2cccc3cccc1c23",           # acenaphthylene
        "c1cc2ccc3cccc4ccc(c1)c2c34",    # pyrene
        "c1ccc2cc3ccccc3cc2c1",          # anthracene
        "c1ccc2c(c1)ccc1ccccc12",        # phenanthrene
        "c1ccc2c(c1)oc1ccccc12",         # dibenzofuran
        "c1ccc2[nH]c3ccccc3c2c1",        # carbazole
        "c1cnc2[nH]ccc2c1",              # 7-azaindole
        "c1ccc2sc3ccccc3c2c1",           # dibenzothiophene
    ]
    for smi in fused:
        c = canonical_smiles(smi)
        assert c is not None, smi
        assert canonical_smiles(c) == c, (smi, c)

    # antiaromatic controls must NOT aromatize (and stay fixed points)
    for smi in ["C1=CC2=CC=CC2=C1",              # pentalene (8pi)
                "C1=CC=CC2=CC=CC=CC2=C1"]:       # heptalene (12pi)
        c = canonical_smiles(smi)
        assert c is not None and "c" not in c, (smi, c)
        assert canonical_smiles(c) == c


def test_malformed_input_raises_domain_errors_only():
    """Raw ValueError/KeyError/IndexError must never escape the public
    chem APIs (found by fuzzing: duplicate ring-closure bonds in
    'c1c1...', non-numeric atom maps in '[C:k]')."""
    from llamole_tpu.chem.reaction import apply_retro_template
    from llamole_tpu.chem.smarts import SmartsError, parse_smarts
    from llamole_tpu.chem.smiles import SmilesError, parse_smiles

    for bad in ["c1c1n2cccc2c1", "O=C(1)c1ccccc/O", "c1c1c2ccc32cpu"]:
        assert canonical_smiles(bad) is None
        with np.testing.assert_raises(SmilesError):
            parse_smiles(bad)
    with np.testing.assert_raises(SmartsError):
        parse_smarts("[C:k](=[O:3])")
    # template application swallows malformed templates entirely
    assert apply_retro_template("[c:1]-[C:2](=[O:3])>>[c:1].[C:k](=[O:3])",
                                "CC(=O)c1ccccc1") == []


def test_native_matcher_differential_fuzz():
    """Random generated SMARTS x random molecules: the native matcher
    (chemkit ck_match_component) must agree with the Python reference
    path EXACTLY — same embeddings, same enumeration order. Skipped
    when the native library is unavailable (then there is only one
    implementation to test)."""
    from llamole_tpu.chem import _native
    from llamole_tpu.chem import smarts as S
    from llamole_tpu.chem.smiles import parse_smiles

    if not _native.available():
        pytest.skip("chemkit native library unavailable")

    rng = np.random.default_rng(7)
    prims = ["C", "N", "O", "S", "c", "n", "o", "s", "#6", "#7", "#8",
             "*", "a", "A", "H0", "H1", "H2", "D1", "D2", "D3", "X2",
             "X3", "R", "!R", "r5", "r6", "R1", "R2", "+", "-", "+0"]
    bonds = ["", "-", "=", "#", ":", "~", "@"]
    mols = [parse_smiles(s) for s in [
        "CC(=O)Oc1ccccc1C(=O)O", "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",
        "c1ccc2ccccc2c1", "C1CC2CCC1CC2", "OB(O)c1ccc(s1)C",
        "O=[N+]([O-])c1ccccc1", "[NH4+].[Cl-]", "Nc1ncc(s1)CC(N)C(=O)O",
        "C1=CC2=CC=CC2=C1", "OC1CCN(CC1)C(=O)c1ccncc1",
    ]]

    def rand_atom():
        k = int(rng.integers(1, 4))
        picks = [str(rng.choice(prims)) for _ in range(k)]
        if k == 1 and picks[0] in "CNOScnos*" and rng.random() < 0.5:
            return picks[0]  # bare atom token
        sep = str(rng.choice([";", ",", "&"]))
        body = sep.join(("!" + p) if rng.random() < 0.2 else p
                        for p in picks)
        return "[" + body + "]"

    checked = 0
    for _ in range(120):
        n = int(rng.integers(1, 5))
        pat = rand_atom()
        open_branch = False
        for _ in range(n - 1):
            b = str(rng.choice(bonds))
            if not open_branch and rng.random() < 0.25:
                pat += "(" + b + rand_atom() + ")"
            else:
                pat += b + rand_atom()
        try:
            comps = S.parse_smarts(pat)
        except S.SmartsError:
            continue
        for qm in comps:
            for mol in mols:
                ref = S.match_component(qm, mol, use_native=False)
                nat = S.match_component(qm, mol, use_native=True)
                assert nat == ref, pat
                checked += 1
    assert checked > 300  # the generator must mostly produce valid SMARTS
