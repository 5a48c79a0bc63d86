"""Extended stereo classes (@AL/@SP/@TB/@OH) — chem/extstereo.py.

The reference reads these through RDKit (molecule_utils.py:30-35); here
they are first-party. No external oracle exists in this environment, so
the locks are (a) first-principles hand derivations for the common low
class numbers, (b) exhaustive written-order sweeps bucketed by the
geometric intrinsic form (every rewriting of one geometry must yield
ONE canonical string, and distinct geometries distinct strings), and
(c) relabeling invariance through Mol.subgraph.
"""

import itertools
import random

import pytest

from llamole_tpu.chem import extstereo as ext
from llamole_tpu.chem.smiles import (
    canonical_smiles,
    mol_to_smiles,
    parse_smiles,
)


def test_round_trip_idempotent():
    for s in [
        "NC(Br)=[C@AL1]=C(F)Cl",
        "ClC=[C@AL1]=CF",
        "ClC=C=[C@AL1]=C=CF",          # penta-cumulene, implicit-H ends
        "F[Pt@SP2](Cl)(Br)N",
        "C[P@TB13](F)(Cl)(Br)N",
        "C[S@OH17](F)(Cl)(Br)(I)N",
        "C[S@OH1H](F)(Cl)(Br)N",       # implicit-H sentinel on the center
        "F[Pt@SP1](Cl)Br",             # lone-pair sentinel (3 neighbors)
    ]:
        c = canonical_smiles(s)
        assert c is not None and "@" in c, s
        assert canonical_smiles(c) == c, (s, c)


def test_hand_derived_equivalences():
    groups = [
        # AL: swapping the two substituents of one end flips the class
        ("NC(Br)=[C@AL1]=C(F)Cl", "BrC(N)=[C@AL2]=C(F)Cl",
         "NC(Br)=[C@AL2]=C(Cl)F"),
        # SP: F trans Br in all three spellings
        ("F[Pt@SP1](Cl)(Br)N", "F[Pt@SP3](Cl)(N)Br", "F[Pt@SP2](Br)(Cl)N"),
        # TB: axial C/N, equatorial F,Cl,Br anticlockwise from C, spelled
        # with an equatorial swap + flip, the (1,4)-axial table row, and
        # the reversed viewing axis
        ("C[P@TB1](F)(Cl)(Br)N", "C[P@TB2](Cl)(F)(Br)N",
         "C[P@TB3](F)(Cl)(N)Br", "N[P@TB2](F)(Cl)(Br)C"),
    ]
    for grp in groups:
        cans = {canonical_smiles(s) for s in grp}
        assert len(cans) == 1 and None not in cans, (grp, cans)


def test_mirror_classes_distinct():
    assert canonical_smiles("NC(Br)=[C@AL1]=C(F)Cl") != \
        canonical_smiles("NC(Br)=[C@AL2]=C(F)Cl")
    assert canonical_smiles("C[S@OH1](F)(Cl)(Br)(I)N") != \
        canonical_smiles("C[S@OH2](F)(Cl)(Br)(I)N")


def test_bare_at_shorthands():
    # @ on 2-/5-/6-coordinate centers = AL1 / TB1 / OH1 (@@ = 2)
    assert canonical_smiles("NC(Br)=[C@]=C(F)Cl") == \
        canonical_smiles("NC(Br)=[C@AL1]=C(F)Cl")
    assert canonical_smiles("C[P@](F)(Cl)(Br)N") == \
        canonical_smiles("C[P@TB1](F)(Cl)(Br)N")
    assert canonical_smiles("C[S@@](F)(Cl)(Br)(I)N") == \
        canonical_smiles("C[S@OH2](F)(Cl)(Br)(I)N")


def test_all_classes_distinct_on_asymmetric_ligands():
    tb = {canonical_smiles(f"C[P@TB{i}](F)(Cl)(Br)N") for i in range(1, 21)}
    oh = {canonical_smiles(f"C[S@OH{i}](F)(Cl)(Br)(I)N")
          for i in range(1, 31)}
    sp = {canonical_smiles(f"F[Pt@SP{i}](Cl)(Br)N") for i in range(1, 4)}
    assert len(tb) == 20 and None not in tb
    assert len(oh) == 30 and None not in oh
    assert len(sp) == 3 and None not in sp


def test_tb_full_written_order_sweep():
    """All 120 written orders x 20 classes collapse onto exactly 20
    canonical strings, in agreement with the intrinsic-form bucketing
    computed directly from the geometric core."""
    ligs = ["C", "F", "Cl", "Br", "N"]
    buckets = {}
    for perm in itertools.permutations(range(5)):
        w = [ligs[i] for i in perm]
        for num in range(1, 21):
            s = f"{w[0]}[P@TB{num}]({w[1]})({w[2]})({w[3]}){w[4]}"
            intr = ext.intrinsic_from_written("TB", num, list(perm))
            c = canonical_smiles(s)
            assert c is not None, s
            buckets.setdefault(intr[1:], set()).add(c)
    assert len(buckets) == 20
    assert all(len(v) == 1 for v in buckets.values())
    assert len(set().union(*buckets.values())) == 20


def test_oh_sampled_written_order_sweep():
    ligs = ["C", "F", "Cl", "Br", "I", "N"]
    rng = random.Random(7)
    perms = [tuple(range(6))] + [
        tuple(rng.sample(range(6), 6)) for _ in range(40)]
    buckets = {}
    for perm in perms:
        w = [ligs[i] for i in perm]
        for num in range(1, 31):
            s = (f"{w[0]}[S@OH{num}]({w[1]})({w[2]})({w[3]})"
                 f"({w[4]}){w[5]}")
            intr = ext.intrinsic_from_written("OH", num, list(perm))
            c = canonical_smiles(s)
            assert c is not None, s
            buckets.setdefault(intr[1:], set()).add(c)
    assert len(buckets) == 30
    assert all(len(v) == 1 for v in buckets.values())
    assert len(set().union(*buckets.values())) == 30


def test_sp_full_written_order_sweep():
    ligs = ["F", "Cl", "Br", "N"]
    buckets = {}
    for perm in itertools.permutations(range(4)):
        w = [ligs[i] for i in perm]
        for num in range(1, 4):
            s = f"{w[0]}[Pt@SP{num}]({w[1]})({w[2]}){w[3]}"
            intr = ext.intrinsic_from_written("SP", num, list(perm))
            c = canonical_smiles(s)
            buckets.setdefault(intr[1:], set()).add(c)
    assert len(buckets) == 3
    assert all(len(v) == 1 for v in buckets.values())


def test_al_permutation_parity_oracle():
    """Every transposition of two substituents in the written order
    flips AL1 <-> AL2 (OpenSMILES treats the allene like a tetrahedral
    center over its four substituents)."""
    from llamole_tpu.chem.mol import perm_parity

    base = canonical_smiles("NC(Br)=[C@AL1]=C(F)Cl")
    # spellings with substituent written orders as permutations of
    # (N, Br, F, Cl); end membership fixed by the skeleton
    spellings = [
        (("N", "Br", "F", "Cl"), "{0}C({1})=[C@AL{{n}}]=C({2}){3}"),
        (("Br", "N", "F", "Cl"), "{0}C({1})=[C@AL{{n}}]=C({2}){3}"),
        (("N", "Br", "Cl", "F"), "{0}C({1})=[C@AL{{n}}]=C({2}){3}"),
        (("Br", "N", "Cl", "F"), "{0}C({1})=[C@AL{{n}}]=C({2}){3}"),
        # branch-reordered skeleton: far end written before the near
        # end's substituents -> written order (F, Cl, Br, N)
        (("F", "Cl", "Br", "N"), "C(=[C@AL{{n}}]=C({0}){1})({2}){3}"),
    ]
    ref = ["N", "Br", "F", "Cl"]
    for order, tmpl in spellings:
        num = 1 if perm_parity(list(order), ref) == 0 else 2
        s = tmpl.format(*order).format(n=num)
        assert canonical_smiles(s) == base, (s, canonical_smiles(s), base)


def test_relabel_invariance_via_subgraph():
    rng = random.Random(3)
    for s in ["C[P@TB13](F)(Cl)(Br)N", "C[S@OH17](F)(Cl)(Br)(I)N",
              "NC(Br)=[C@AL1]=C(F)Cl", "F[Pt@SP2](Cl)(Br)N",
              "ClC=[C@AL1]=CF", "C[S@OH1H](F)(Cl)(Br)N"]:
        m = parse_smiles(s)
        base = mol_to_smiles(m)
        assert "@" in base
        for _ in range(10):
            perm = list(range(m.n_atoms()))
            rng.shuffle(perm)
            assert mol_to_smiles(m.subgraph(perm)) == base, (s, perm)


def test_false_chirality_identical_ligands():
    # all-identical ligands: every class is the same molecule
    cans = {canonical_smiles(f"F[P@TB{i}](F)(F)(F)F") for i in (1, 2)}
    assert len(cans) == 1
    # SP with two F / two Cl: SP1 and SP3 are the same cis arrangement,
    # SP2 (trans F-F) is the other isomer
    a = canonical_smiles("F[Pt@SP1](F)(Cl)Cl")
    b = canonical_smiles("F[Pt@SP3](F)(Cl)Cl")
    c = canonical_smiles("F[Pt@SP2](F)(Cl)Cl")
    assert a == b and a != c


def test_invalid_sites_drop_permissively():
    # wrong neighbor count, non-cumulene @AL, CH2-terminated allene,
    # and an even cumulene (planar, not axial) all drop the mark
    pairs = [
        ("F[As@TB1](Cl)Br", "F[As](Cl)Br"),
        ("F[C@AL1](Cl)(Br)N", "FC(Cl)(Br)N"),
        ("C(=[C@AL1]=C)F", "C(=C=C)F"),
        ("CC=[C@AL1]=C=CC", "CC=C=C=CC"),
    ]
    for decorated, plain in pairs:
        got = canonical_smiles(decorated)
        assert got == canonical_smiles(plain) and "@" not in got, decorated


def test_out_of_range_class_rejected():
    assert canonical_smiles("F[As@TB21](Cl)(Br)(N)C") is None
    assert canonical_smiles("F[Pt@SP4](Cl)(Br)N") is None
    assert canonical_smiles("C[S@OH31](F)(Cl)(Br)(I)N") is None


def test_subgraph_drop_when_participant_missing():
    m = parse_smiles("C[P@TB1](F)(Cl)(Br)N")
    keep = [i for i in range(m.n_atoms()) if m.atoms[i].symbol != "F"]
    assert "@" not in mol_to_smiles(m.subgraph(keep))
