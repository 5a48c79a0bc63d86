"""First-party 2D depiction (VERDICT round-1 item 10; reference
launch.py:175-187 RDKit Draw equivalents)."""

import math

from llamole_tpu.chem.depict import layout_2d, mol_to_svg, reaction_to_svg
from llamole_tpu.chem.smiles import parse_smiles

CASES = [
    "CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "c1ccc2ccccc2c1",
    "CC(N)C(=O)O", "c1ccc2cccc2cc1", "CC.OCC",
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C",          # caffeine (fused N-heterocycle)
    "O=C(O)c1ccccc1N", "C1CCCCC1C1CCCCC1",
]


def test_layout_geometry():
    for smi in CASES:
        m = parse_smiles(smi)
        coords = layout_2d(m)
        assert len(coords) == m.n_atoms()
        # chain/ring bonds stay at unit length; no two atoms collide
        for b in m.bonds:
            d = math.hypot(coords[b.a1][0] - coords[b.a2][0],
                           coords[b.a1][1] - coords[b.a2][1])
            assert 0.5 < d < 3.0, (smi, d)
        n = len(coords)
        for i in range(n):
            for j in range(i + 1, n):
                d = math.hypot(coords[i][0] - coords[j][0],
                               coords[i][1] - coords[j][1])
                assert d > 0.3, (smi, i, j, d)


def test_mol_svg():
    for smi in CASES:
        svg = mol_to_svg(smi)
        assert svg is not None and svg.startswith("<svg") and "</svg>" in svg
    # heteroatoms get labels; skeletal carbons stay unlabeled
    svg = mol_to_svg("CCN")
    assert ">NH2<" in svg
    assert mol_to_svg("garbage((") is None
    assert mol_to_svg("") is None


def test_reaction_svg():
    svg = reaction_to_svg("CC(=O)Oc1ccccc1C(=O)O",
                          ["CC(=O)O", "Oc1ccccc1C(=O)O"])
    assert svg is not None and "<polygon" in svg and svg.count("<g ") == 3
    assert reaction_to_svg("bad((", ["CCO"]) is None


def test_launch_render_helper():
    from launch import render_molecule_and_route

    mol_svg, rxn_svg = render_molecule_and_route(
        "CC(=O)Oc1ccccc1C(=O)O",
        ["CC(=O)Oc1ccccc1C(=O)O>>CC(=O)O.Oc1ccccc1C(=O)O"])
    assert mol_svg.startswith("<svg")
    assert rxn_svg.count("<svg") == 1
    # no molecule -> empty strings, no crash
    mol_svg, rxn_svg = render_molecule_and_route(None, None)
    assert mol_svg == "" and rxn_svg == ""


def test_wedge_marks_for_tetrahedral_centers():
    """Chiral centers get exactly one out-of-plane mark (solid polygon
    wedge or hashed rungs); the mirror molecule flips the mark kind on
    the same bond (the wedge-bond choice is parity-independent), and
    achiral molecules render none."""
    from llamole_tpu.chem.depict import mol_to_svg

    a = mol_to_svg("N[C@@H](C)C(=O)O")
    b = mol_to_svg("N[C@H](C)C(=O)O")
    plain = mol_to_svg("NC(C)C(=O)O")
    assert a and b and plain
    assert a != b
    assert "polygon" not in plain
    # mirror pair: same chosen bond, flipped kind -> exactly one solid
    assert ("polygon" in a) != ("polygon" in b)

    # quaternary (degree-4) center
    q1 = mol_to_svg("F[C@](Cl)(Br)I")
    q2 = mol_to_svg("F[C@@](Cl)(Br)I")
    assert q1 and q2 and q1 != q2
    assert ("polygon" in q1) != ("polygon" in q2)


def test_wedge_deterministic_and_canonical_stable():
    from llamole_tpu.chem.depict import mol_to_svg
    from llamole_tpu.chem.smiles import canonical_smiles

    s = "O=C(O)[C@@H]1CCCN1"
    c = canonical_smiles(s)
    assert mol_to_svg(c) == mol_to_svg(c)
    svg = mol_to_svg(s)
    assert svg is not None  # ring stereocenter renders without error
