"""SMARTS engine + retro template application tests
(rdchiral-replacement semantics)."""

import pytest

from llamole_tpu.chem.reaction import apply_retro_template
from llamole_tpu.chem.smarts import match_component, parse_smarts
from llamole_tpu.chem.smiles import parse_smiles


def _n_matches(pattern, smiles):
    comps = parse_smarts(pattern)
    return len(match_component(comps[0], parse_smiles(smiles)))


def test_primitive_matching():
    assert _n_matches("C", "CCO") == 2        # aliphatic carbons
    assert _n_matches("c", "Cc1ccccc1") == 6  # aromatic carbons
    assert _n_matches("[#6]", "Cc1ccccc1") == 7
    assert _n_matches("[CH3]", "CCO") == 1
    assert _n_matches("[D2]", "CCO") == 1     # middle carbon
    assert _n_matches("[R]", "Cc1ccccc1") == 6
    assert _n_matches("[!R]", "Cc1ccccc1") == 1
    assert _n_matches("[O-]", "CC(=O)[O-]") == 1
    assert _n_matches("[O;H1]", "CC(=O)O") == 1
    assert _n_matches("[O,N]", "NCCO") == 2


def test_bond_matching():
    assert _n_matches("C=O", "CC(=O)O") == 1
    assert _n_matches("C-O", "CC(=O)O") == 1   # only the C-OH single bond
    assert _n_matches("C~O", "CC(=O)O") == 2   # C=O and C-OH
    assert _n_matches("c:c", "c1ccccc1") == 12


def test_ring_closure_pattern():
    assert _n_matches("C1CCCCC1", "C1CCCCC1") == 12  # symmetric embeddings
    assert _n_matches("C1CCCCC1", "CCCCCC") == 0


def test_atom_map_parsing():
    comp = parse_smarts("[C;H0;D3;+0:4](=[O;D1;H0:6])")[0]
    assert comp.atoms[0].atom_map == 4
    assert comp.atoms[1].atom_map == 6


def test_corpus_templates_parse():
    templates = [
        "Cl-[C;H0;D3;+0:4](-[#8:5])=[O;D1;H0:6]",
        "O-B(-O)-[c;H0;D3;+0:7]1:[c:8]:[cH;D2;+0:9]:c:[s;H0;D2;+0:10]:1",
        "[#16;a:6]:[c:7](:[#7;a:8])-[NH2;D1;+0:9]",
        "[C;D1;H3:4]-[NH;D2;+0:5]-[c:6]",
    ]
    for t in templates:
        comps = parse_smarts(t)
        assert sum(len(c.atoms) for c in comps) >= 2


def test_retro_ester_hydrolysis():
    out = apply_retro_template(
        "[C:1](=[O:2])-[O:3]-[C:4]>>[C:1](=[O:2])-[OH].[OH]-[C:4]",
        "CC(=O)OCC")
    assert "CC(=O)O.CCO" in out


def test_retro_amide():
    out = apply_retro_template(
        "[C:1](=[O:2])-[NH;D2;+0:3]>>[C:1](=[O:2])-[OH].[NH2;D1;+0:3]",
        "CC(=O)NC")
    assert out == ["CC(=O)O.CN"]


def test_unmapped_lhs_atoms_deleted():
    out = apply_retro_template(
        "[#7:5]-[CH3;D1;+0:6]>>[#7:5].[CH3]-I", "CN(C)c1ccccc1")
    assert out == ["CI.CNc1ccccc1"]


def test_no_match_returns_empty():
    assert apply_retro_template(
        "[C:1](=[O:2])-[O:3]-[C:4]>>[C:1](=[O:2])-[OH].[OH]-[C:4]",
        "CCCC") == []


def test_bad_inputs_never_raise():
    assert apply_retro_template("not a template", "CCO") == []
    assert apply_retro_template("[C:1]>>[C:1]O", "((bad") == []
    assert apply_retro_template("[C:1]>>", "CC") == []


def test_charge_zero_primitive():
    # '+0' must match neutral atoms only
    assert _n_matches("[N;+0]", "C[N+](C)(C)C") == 0
    assert _n_matches("[N;+0]", "CNC") == 1
    assert _n_matches("[N;+1]", "C[N+](C)(C)C") == 1


def test_smarts_ring_size_and_count():
    """r<n> = SSSR ring of size n; R<n> = member of n SSSR rings
    (exact-SSSR semantics, not the round-1 any-ring approximation)."""
    from llamole_tpu.chem.smarts import match_component, parse_smarts
    from llamole_tpu.chem.smiles import parse_smiles

    # indole: 5-ring {r5}, 6-ring {r6}, fusion atoms in both
    mol = parse_smiles("c1ccc2[nH]ccc2c1")
    r5 = parse_smarts("[r5]")[0]
    r6 = parse_smarts("[r6]")[0]
    r7 = parse_smarts("[r7]")[0]
    two_rings = parse_smarts("[R2]")[0]
    n5 = {m[0] for m in match_component(r5, mol)}
    n6 = {m[0] for m in match_component(r6, mol)}
    n7 = {m[0] for m in match_component(r7, mol)}
    fused = {m[0] for m in match_component(two_rings, mol)}
    assert len(n5) == 5 and len(n6) == 6 and not n7
    assert fused == n5 & n6 and len(fused) == 2

    # acyclic molecule: no ring primitives match
    chain = parse_smiles("CCOCC")
    assert not match_component(r5, chain)
    assert not match_component(parse_smarts("[R]")[0], chain)
    assert len(match_component(parse_smarts("[!R]")[0], chain)) == 5


def test_cached_parses_are_not_corrupted_by_rewrites():
    """apply_retro_template caches parsed products/templates; the
    rewrite deep-copies before editing, so repeated interleaved
    applications must be deterministic (a shallow-copy regression would
    corrupt the shared Mol and change later outcomes)."""
    t_ester = "[C:1](=[O:2])-[O:3]-[C:4]>>[C:1](=[O:2])-[OH].[OH]-[C:4]"
    t_amide = "[C:1](=[O:2])-[NH:3]>>[C:1](=[O:2])-[OH].[NH2:3]"
    prod = "CC(=O)OCCNC(C)=O"
    first = [apply_retro_template(t, prod) for t in (t_ester, t_amide)]
    assert first[0], "ester template must apply"
    for _ in range(5):
        again = [apply_retro_template(t, prod) for t in (t_ester, t_amide)]
        assert again == first
