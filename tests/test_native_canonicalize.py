"""ck_canonicalize parity: the fused native sanitize + canonical-SMILES
kernel must be bit-identical to the Python reference path
(chem/smiles.py sanitize_mol + mol_to_smiles) — same strings, same
post-sanitize flags, same errors — including tetrahedral parity and
double-bond cis/trans (native since round 4; the automorphic tie-break
enumeration is ported too), and must fall back cleanly (never wrongly
engage) on extended-stereo input (@AL/@SP/@TB/@OH, chem/extstereo.py)."""

import numpy as np
import pytest

from llamole_tpu.chem import _native
from llamole_tpu.chem import smiles as S
from llamole_tpu.chem.mol import Atom, Mol
from llamole_tpu.chem.smiles import (SmilesError, canonical_ranks,
                                     canonical_smiles, mol_to_smiles,
                                     parse_smiles, sanitize_and_write)

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="chemkit native library unavailable")

CORPUS = [
    "CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "O=[N+]([O-])c1ccccc1",
    "CN1C=NC2=C1C(=O)N(C)C(=O)N2C", "*CC(*)c1ccccc1", "[NH4+]",
    "CNc1nccn2c(Br)cnc12", "c1ccc2ccccc2c1", "C1CCCCC1", "[O-]c1ccccc1",
    "C1=CC2=CC=CC2=C1", "c1ccc2c(c1)ccc1ccccc12", "C12C3C4C1C5C2C3C45",
    "c1cc2ccc3cccc4ccc(c1)c2c34", "C1CCC2(CC1)CCCCC2",
    "N1C2CC3CC1CC(C2)C3", "C1OC1c1ccccc1", "[13CH4]", "[NH4+].[Cl-]",
    "CC(=O)[O-].[Na+]", "c1ccoc1", "c1cc[nH]c1", "O=C(Cl)c1ccccc1",
    "OB(O)c1ccc(s1)C", "CN(C)c1ccccc1", "c1ccc2[nH]ccc2c1",
    "C[Si](C)(C)C", "[se]1cccc1", "S(=O)(=O)(O)c1ccccc1",
    "[C:1](=[O:2])([OH:3])[CH3:4]", "C1=Cc2cccc3cccc1c23",
    "c1ccc2cc3ccccc3cc2c1", "c1cnc2[nH]ccc2c1", "C1=CC2=CC=CC2=CC=C1",
]


def _python_sanitize_write(mol):
    """Pure-Python sanitize + canonical write (the reference path),
    bypassing every native dispatch point."""
    S.kekulize(mol)
    errs = S.valence_errors(mol)
    if errs:
        i, v = errs[0]
        raise SmilesError(
            f"Explicit valence for atom # {i} {mol.atoms[i].symbol}, "
            f"{v:g}, is greater than permitted")
    S.perceive_aromaticity(mol)
    for b in mol.bonds:
        if b.stereo is not None and (b.aromatic or b.order != 2):
            b.stereo = None
            b.stereo_atoms = None
    return _python_write(mol)


def _python_write(mol):
    """Pure-Python canonical write incl. the stereo tie-break path."""
    if any(a.parity for a in mol.atoms) or any(b.stereo for b in mol.bonds):
        return min(S._generate_smiles(mol, ranks)
                   for ranks in S._enumerate_rankings(mol))
    return S._generate_smiles(mol, canonical_ranks(mol, use_native=False))


@pytest.mark.parametrize("smi", CORPUS)
def test_fused_canonicalize_matches_python(smi):
    mol_n = parse_smiles(smi, sanitize=False)
    mol_p = parse_smiles(smi, sanitize=False)
    res = _native.canonicalize(mol_n, sanitize=True, write=True,
                               apply_flags=True)
    assert res is not None and res[0] == "ok", smi
    py = _python_sanitize_write(mol_p)
    assert res[1] == py, smi
    # post-sanitize flags identical too
    for an, ap in zip(mol_n.atoms, mol_p.atoms):
        assert an.aromatic == ap.aromatic, smi
    for bn, bp in zip(mol_n.bonds, mol_p.bonds):
        assert (bn.order, bn.aromatic) == (bp.order, bp.aromatic), smi


def test_write_only_matches_python_on_sanitized_mols():
    for smi in CORPUS:
        mol = parse_smiles(smi, sanitize=True)
        res = _native.canonicalize(mol, sanitize=False, write=True)
        assert res is not None and res[0] == "ok", smi
        ref = S._generate_smiles(mol, canonical_ranks(mol, use_native=False))
        assert res[1] == ref, smi


def test_error_parity_valence():
    # pentavalent carbon: same exception text from both paths
    mol_n = parse_smiles("C(C)(C)(C)(C)C", sanitize=False)
    mol_p = parse_smiles("C(C)(C)(C)(C)C", sanitize=False)
    with pytest.raises(SmilesError) as en:
        sanitize_and_write(mol_n)
    with pytest.raises(SmilesError) as ep:
        _python_sanitize_write(mol_p)
    assert str(en.value) == str(ep.value)


def test_error_parity_kekulize():
    # odd all-carbon aromatic ring: no perfect matching exists
    mol_n = parse_smiles("c1cccc1", sanitize=False)
    mol_p = parse_smiles("c1cccc1", sanitize=False)
    with pytest.raises(SmilesError) as en:
        sanitize_and_write(mol_n)
    with pytest.raises(SmilesError) as ep:
        _python_sanitize_write(mol_p)
    assert str(en.value) == str(ep.value) == "kekulization failed"


STEREO_CORPUS = [
    "N[C@@H](C)C(=O)O", "C/C=C/C", "F[C@H](Cl)Br", "N[C@H](C)C(=O)O",
    "F/C=C/F", "F/C=C\\F", "C(/F)=C/F", "[S@](=O)(C)CC",
    "C[C@@H]1CC[C@H](C)CC1", "C[C@H]1CC[C@H](C)CC1",
    "F[C@H]2CC1(CC1)C2", "C/C=C/C=C\\C(=O)O[C@@H]1CC[C@H](N)CC1",
    "O=C(O)[C@@H]1CCCN1C(=O)[C@H](N)Cc1ccccc1",
    "C[C@]12CC[C@H]3[C@@H](CCC4=CC(=O)CC[C@@]43C)[C@@H]1CC[C@@H]2O",
    "CC(C)c1n(CC[C@@H](O)C[C@@H](O)CC(=O)O)c(-c2ccc(F)cc2)c(-c2ccccc2)c1",
    "C[C@@H](O)/C=C/[C@H](N)C(=O)O",
    "F/C(CC1CC1)=C(/Br)C[C@@H](N)C",
]


@pytest.mark.parametrize("smi", STEREO_CORPUS)
def test_stereo_canonicalize_matches_python(smi):
    """Tetrahedral parity + cis/trans run natively and bit-match the
    Python stereo writer (incl. the automorphic tie-break min)."""
    mol_n = parse_smiles(smi, sanitize=False)
    mol_p = parse_smiles(smi, sanitize=False)
    res = _native.canonicalize(mol_n, sanitize=True, write=True)
    assert res is not None and res[0] == "ok", smi
    assert res[1] == _python_sanitize_write(mol_p), smi
    # idempotence through the public path
    c = canonical_smiles(smi)
    assert c is not None and canonical_smiles(c) == c, smi


def test_extended_stereo_never_serializes():
    for smi in ["NC(Br)=[C@AL1]=C(F)Cl", "C[P@TB1](F)(Cl)(Br)N",
                "F[Pt@SP2](Cl)(Br)N", "C[S@OH17](F)(Cl)(Br)(I)N"]:
        mol = parse_smiles(smi, sanitize=False)
        assert _native.canonicalize(mol) is None, smi
        assert _native.parse(smi) is None, smi
        # and the public path still canonicalizes via Python
        c = canonical_smiles(smi)
        assert c is not None and canonical_smiles(c) == c, smi


def test_differential_fuzz_random_strings():
    """Random SMILES-ish strings: whenever both paths accept, outputs
    (or errors) must agree exactly."""
    rng = np.random.default_rng(17)
    alphabet = list("CNOSPcnos()[]=#123+-*FIBrlH@/\\")

    def gen():
        # half pure-random, half corpus mutations (much higher parse yield)
        if rng.random() < 0.5:
            length = int(rng.integers(2, 22))
            return "".join(rng.choice(alphabet, size=length))
        s = list(CORPUS[int(rng.integers(0, len(CORPUS)))])
        for _ in range(int(rng.integers(1, 4))):
            op = rng.random()
            pos = int(rng.integers(0, len(s)))
            if op < 0.4 and len(s) > 2:
                del s[pos]
            elif op < 0.8:
                s[pos] = str(rng.choice(alphabet))
            else:
                s.insert(pos, str(rng.choice(alphabet)))
        return "".join(s)

    agreed = 0
    for _ in range(400):
        s = gen()
        try:
            mol_n = parse_smiles(s, sanitize=False)
            mol_p = parse_smiles(s, sanitize=False)
        except SmilesError:
            continue
        if any(a.ext_stereo is not None for a in mol_n.atoms):
            continue  # extended stereo: Python-only by design
        try:
            py = _python_sanitize_write(mol_p)
            py_err = None
        except SmilesError as e:
            py, py_err = None, str(e)
        res = _native.canonicalize(mol_n, sanitize=True, write=True)
        if res is None:
            continue  # legitimate fallback (caps); Python path covers
        kind, nat = res
        if py_err is not None:
            assert kind != "ok", (s, nat, py_err)
        else:
            assert kind == "ok" and nat == py, (s, nat, py)
        agreed += 1
    assert agreed > 60, f"only {agreed} strings exercised both paths"


def test_differential_fuzz_random_graphs():
    """Random mutable-graph molecules, including edit histories that
    scramble _adj insertion order vs bond order (the serialization must
    reflect the true dict order)."""
    rng = np.random.default_rng(23)
    zs = [5, 6, 7, 8, 9, 15, 16, 17, 35]
    agreed = 0
    for trial in range(250):
        n = int(rng.integers(1, 12))
        mol = Mol()
        for _ in range(n):
            mol.add_atom(Atom(int(rng.choice(zs)),
                              charge=int(rng.integers(-1, 2))
                              if rng.random() < 0.15 else 0))
        for _ in range(int(rng.integers(0, n * 2))):
            a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
            if a != b and b not in mol._adj[a]:
                mol.add_bond(a, b, order=int(rng.choice([1, 1, 1, 2, 3])))
        if mol.n_bonds() > 1 and trial % 3 == 0:
            bd = mol.bonds[int(rng.integers(0, mol.n_bonds()))]
            mol.remove_bond(bd.a1, bd.a2)
        mol2 = mol.copy()
        try:
            py = _python_sanitize_write(mol2)
            py_err = None
        except SmilesError as e:
            py, py_err = None, str(e)
        res = _native.canonicalize(mol, sanitize=True, write=True)
        if res is None:
            continue
        kind, nat = res
        if py_err is not None:
            assert kind != "ok", (trial, nat, py_err)
        else:
            assert kind == "ok" and nat == py, (trial, nat, py)
        agreed += 1
    assert agreed > 150


def _python_parse(text, sanitize=False):
    """Pure-Python parse, bypassing the native dispatch in parse_smiles."""
    return S._parse_smiles_inner(text, sanitize)


def _mols_equal(a, b):
    if a.n_atoms() != b.n_atoms() or a.n_bonds() != b.n_bonds():
        return False
    for x, y in zip(a.atoms, b.atoms):
        if (x.z, x.charge, x.explicit_hs, x.aromatic, x.isotope,
                x.atom_map, x.parity) != (y.z, y.charge, y.explicit_hs,
                                          y.aromatic, y.isotope,
                                          y.atom_map, y.parity):
            return False
    for x, y in zip(a.bonds, b.bonds):
        if (x.a1, x.a2, x.order, x.aromatic, x.stereo, x.stereo_atoms) != \
                (y.a1, y.a2, y.order, y.aromatic, y.stereo, y.stereo_atoms):
            return False
    # _adj insertion order must match too (serialization depends on it)
    for da, db in zip(a._adj, b._adj):
        if list(da.items()) != list(db.items()):
            return False
    return True


@pytest.mark.parametrize("smi", CORPUS)
def test_native_parse_matches_python(smi):
    res = _native.parse(smi, sanitize=False)
    assert res is not None and res[0] == "ok", smi
    from llamole_tpu.chem.smiles import _mol_from_parse_arrays
    mol_n = _mol_from_parse_arrays(res[1], res[2])
    mol_p = _python_parse(smi)
    assert _mols_equal(mol_n, mol_p), smi


def test_native_parse_bracket_quirks():
    # the Python parser's exact bracket semantics must carry over
    for smi, z, chg, ehs, iso, amap in [
        ("[NH4+]", 7, 1, 4, 0, 0),
        ("[13CH4]", 6, 0, 4, 13, 0),
        ("[C:7]", 6, 0, 0, 0, 7),
        ("[O--]", 8, -2, 0, 0, 0),
        ("[Fe+3]", 26, 3, 0, 0, 0),
        ("[se]", 34, 0, 0, 0, 0),
        ("[CH0]", 6, 0, 1, 0, 0),  # H0 -> 1 quirk, parity with Python
        ("[H]", 1, 0, 0, 0, 0),
        ("[*:2]", 0, 0, 0, 0, 2),
    ]:
        res = _native.parse(smi, sanitize=False)
        assert res is not None and res[0] == "ok", smi
        (az, ac, ai, ae, _aro, am, _par), = res[1]
        assert (az, ac, ae, ai, am) == (z, chg, ehs, iso, amap), smi
        mol_p = _python_parse(smi)
        a = mol_p.atoms[0]
        assert (a.z, a.charge, a.explicit_hs, a.isotope, a.atom_map) == \
            (z, chg, ehs, iso, amap), smi


def test_native_parse_reject_parity():
    """Whenever the native parser errors or rejects, the Python parser
    must reject too (the fallback hides divergence — this test doesn't)."""
    rng = np.random.default_rng(31)
    alphabet = list("CNOSPcnos()[]=#123+-*FIBrlH%.")
    checked = 0
    for _ in range(500):
        length = int(rng.integers(1, 18))
        s = "".join(rng.choice(alphabet, size=length))
        res = _native.parse(s, sanitize=True)
        if res is None:
            # parse error / unsupported / unavailable: Python decides.
            # Stereo never arises (no @ / \\ in alphabet), so a None here
            # that Python ACCEPTS and sanitizes cleanly = divergence.
            try:
                mol = _python_parse(s, sanitize=False)
                _python_sanitize_write(mol)
                ok_python = True
            except SmilesError:
                ok_python = False
            assert not ok_python, s
            checked += 1
        elif res[0] in ("kekulize", "valence"):
            mol = _python_parse(s, sanitize=False)
            with pytest.raises(SmilesError):
                _python_sanitize_write(mol)
            checked += 1
        else:
            # native arrays are post-sanitize: sanitize the Python mol
            # via the pure-Python stages before comparing
            mol_p = _python_parse(s, sanitize=False)
            S.kekulize(mol_p)
            assert not S.valence_errors(mol_p), s
            S.perceive_aromaticity(mol_p)
            from llamole_tpu.chem.smiles import _mol_from_parse_arrays
            assert _mols_equal(_mol_from_parse_arrays(res[1], res[2]),
                               mol_p), s
            checked += 1
    assert checked == 500


def test_parse_fuzz_corpus_mutations():
    rng = np.random.default_rng(41)
    alphabet = list("CNOSPcnos()[]=#123+-*FIBrlH")
    from llamole_tpu.chem.smiles import _mol_from_parse_arrays
    agreed = 0
    for _ in range(300):
        s = list(CORPUS[int(rng.integers(0, len(CORPUS)))])
        for _ in range(int(rng.integers(0, 4))):
            op = rng.random()
            pos = int(rng.integers(0, len(s)))
            if op < 0.4 and len(s) > 2:
                del s[pos]
            elif op < 0.8:
                s[pos] = str(rng.choice(alphabet))
            else:
                s.insert(pos, str(rng.choice(alphabet)))
        s = "".join(s)
        res = _native.parse(s, sanitize=False)
        try:
            mol_p = _python_parse(s)
            py_ok = True
        except SmilesError:
            py_ok = False
        if res is None:
            assert not py_ok, s
            continue
        assert res[0] == "ok" and py_ok, s
        assert _mols_equal(_mol_from_parse_arrays(res[1], res[2]), mol_p), s
        agreed += 1
    assert agreed > 100


def test_aromatic_bond_to_nonaromatic_atom_rejected_both_paths():
    """'C:c1ccccc1' (explicit aromatic bond onto an aliphatic C) is
    rejected by the Python reference (kekulize KeyError -> wrapped
    SmilesError); the native path must decline rather than accept —
    regression for a confirmed round-3 review finding."""
    res = _native.parse("C:c1ccccc1", sanitize=True)
    assert res is None or res[0] != "ok"
    assert canonical_smiles("C:c1ccccc1") is None
    mol = parse_smiles("C:c1ccccc1", sanitize=False)
    assert _native.canonicalize(mol, sanitize=True, write=True) is None
    with pytest.raises(SmilesError):
        parse_smiles("C:c1ccccc1", sanitize=True)


def test_public_api_unchanged_by_dispatch():
    """mol_to_smiles / canonical_smiles / sanitize_and_write round-trip
    through the native path and stay fixed points."""
    for smi in CORPUS + STEREO_CORPUS:
        c = canonical_smiles(smi)
        assert c is not None, smi
        assert canonical_smiles(c) == c, smi
        mol = parse_smiles(c)
        assert mol_to_smiles(mol) == c, smi
        mol2 = parse_smiles(smi, sanitize=False)
        assert sanitize_and_write(mol2) == c, smi


def test_stereo_decoration_fuzz():
    """Randomly decorate corpus molecules with tetrahedral marks and
    directional bonds; whenever the string parses, the native end-to-end
    canonical (string -> string) must equal the pure-Python reference,
    the parse arrays must restore the identical Mol (parity + cis/trans
    included), and the canonical form must be a fixed point."""
    rng = np.random.default_rng(53)
    checked = 0
    for _ in range(300):
        base = CORPUS[int(rng.integers(0, len(CORPUS)))]
        s = []
        for ch in base:
            if ch in "CN" and rng.random() < 0.25:
                s.append("[%s@%s]" % (ch, "@" if rng.random() < 0.5 else ""))
                continue
            s.append(ch)
            if ch in ")1234CNOS" and rng.random() < 0.12:
                s.append("/" if rng.random() < 0.5 else "\\")
        s = "".join(s)
        try:
            mol_p = _python_parse(s, sanitize=False)
        except (SmilesError, ValueError, KeyError, IndexError):
            assert _native.parse(s, sanitize=False) is None, s
            continue
        res = _native.parse(s, sanitize=False)
        if any(a.ext_stereo is not None for a in mol_p.atoms):
            assert res is None, s  # extended stereo stays Python-only
            continue
        if res is not None:
            # a None here is a legitimate decline (bare @/@@ on a 2-/5-/
            # 6-coordinate atom is an extended-stereo shorthand only the
            # Python path can resolve — even when it resolves to a drop)
            assert res[0] == "ok", s
            from llamole_tpu.chem.smiles import _mol_from_parse_arrays
            assert _mols_equal(_mol_from_parse_arrays(res[1], res[2]),
                               mol_p), s
        # end-to-end canonical parity + fixed point (canonical_smiles
        # falls back to Python internally when the native path declined)
        try:
            py = _python_sanitize_write(_python_parse(s, sanitize=False))
        except SmilesError:
            py = None
        nat = canonical_smiles(s)
        assert nat == py, (s, nat, py)
        if nat is not None and res is not None:
            assert canonical_smiles(nat) == nat, s
            checked += 1
    assert checked > 60, f"only {checked} decorated strings canonicalized"
