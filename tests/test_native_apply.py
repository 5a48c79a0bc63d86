"""ck_apply_template parity: the native retro-template engine must be
bit-identical to the Python reference path (chem/reaction.py
_apply_python) — same outcome strings, same order, same caps — and must
never engage for chirality-bearing templates or products."""

import numpy as np
import pytest

from llamole_tpu.chem import _native
from llamole_tpu.chem.reaction import (ReactionError, _apply_python,
                                       _parsed_product, _parsed_template,
                                       _product_blob, _template_blob,
                                       apply_retro_template)
from llamole_tpu.chem.smarts import SmartsError
from llamole_tpu.chem.smiles import SmilesError

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="chemkit native library unavailable")

TEMPLATES = [
    # USPTO-style retro templates spanning the rewrite feature space:
    # bond cut + H restore
    "[C:1](=[O:2])-[O:3]-[C:4]>>[C:1](=[O:2])-[OH].[OH]-[C:4]",
    "[C:1](=[O:2])-[NH;D2;+0:3]>>[C:1](=[O:2])-[OH].[NH2;D1;+0:3]",
    # atom deletion (LHS-matched atom absent from RHS)
    "[c:1][Br:2]>>[c:1]",
    "[#7:5]-[CH3;D1;+0:6]>>[#7:5].[CH3]-I",
    # unmapped new RHS atoms
    "[C:1](=[O:2])[OH:3]>>[C:1](=[O:2])[O:3]CC",
    "[c:1][I:2]>>[c:1]B(O)O",
    # charge edits
    "[NH3+:1]>>[N+0:1]",
    "[O;H1:1]>>[O-:1].[Na+]",
    # bond-order rewrite between mapped atoms
    "[C:1]=[C:2]>>[C:1][C:2]",
    "[C:1]#[N:2]>>[C:1]=[N:2]",
    # aromatic default bonds on both sides
    "[c:1][N:2]>>[c:1].[N:2]",
    "[c:1]:[c:2]>>[c:1].[c:2]",
    # multi-component LHS (multi-fragment product patterns)
    "[C:1](=[O:2])[OH:3].[OH:4][C:5]>>[C:1](=[O:2])[O:3][C:5].[OH2:4]",
    # H-count pins on RHS
    "[N:1][C:2]>>[NH2:3][CH3:4].[N:1].[C:2]",
    # ring cut
    "[C:1]1[C:2][C:3][C:4][C:5][O:6]1>>[C:1]=[C:2].[C:3][C:4][C:5][O:6]",
    # degree/connectivity/ring primitives in the LHS
    "[C;R0;D2:1][O:2]>>[C;R0:1].[O:2]",
    "[cH1:1]>>[c:1]C",
]

PRODUCTS = [
    "CC(=O)Oc1ccccc1C(=O)O", "CC(=O)OC", "CC(=O)NC", "CN(C)c1ccccc1",
    "CNc1nccn2c(Br)cnc12", "CC(=O)Nc1ccc(O)cc1", "c1ccc2[nH]ccc2c1",
    "O=C(O)c1ccccc1", "C=CC(=O)OCC", "N#Cc1ccccc1", "OCCOc1ccccc1",
    "[NH4+].[Cl-]", "CC(=O)[O-].[Na+]", "Brc1ccc(Br)cc1",
    "COC(=O)c1ccc(OC(C)=O)cc1",  # symmetric-ish: multiple embeddings
    "CC(C)(C)OC(=O)NC1CCNCC1", "O=[N+]([O-])c1ccc(Cl)cc1",
    "c1ccoc1", "C1CCOC1", "CCOC(=O)CC(=O)OCC",  # two ester embeddings
    "Ic1ccccc1", "CCN", "CCO", "C#N", "C1CCCCC1", "C1CCCCO1",
    "C[N+](C)(C)C", "CC(=O)O.OCC", "CC(=O)OCC", "C[NH3+]",
]


def _python_outcomes(template, product_smiles, max_outcomes=16):
    """Reference outcomes with the native sanitize/write dispatch forced
    OFF, so fragment canonicalization divergences can't hide (the
    matcher dispatch stays native — its identity is proven separately in
    test_native.py)."""
    from unittest import mock

    try:
        lhs, rhs = _parsed_template(template)
        if (not any(c.atoms for c in lhs)) or (not any(c.atoms for c in rhs)):
            return ()
        product = _parsed_product(product_smiles)
    except (SmartsError, SmilesError, ReactionError):
        return ()
    with mock.patch.object(_native, "canonicalize", lambda *a, **k: None), \
            mock.patch.object(_native, "parse", lambda *a, **k: None):
        return _apply_python(lhs, rhs, product, max_outcomes)


@pytest.mark.parametrize("template", TEMPLATES)
def test_grid_parity(template):
    tb = _template_blob(template)
    assert tb is not None, template  # all corpus templates achiral
    any_hit = False
    for prod in PRODUCTS:
        pb = _product_blob(_parsed_product(prod))
        assert pb is not None, prod
        native = _native.apply_template(pb, tb, 32, 64, 16)
        assert native is not None, (template, prod)
        py = _python_outcomes(template, prod)
        assert native == py, (template, prod, native, py)
        any_hit = any_hit or bool(native)
    assert any_hit, f"template never fired: {template}"


def test_max_outcomes_cutoff_parity():
    # symmetric product with many embeddings: the cutoff must bite at
    # the same outcome on both paths
    template = "[C:1][C:2]>>[C:1].[C:2]"
    prod = "CCCCCCCC"
    for cap in (1, 2, 3, 16):
        tb = _template_blob(template)
        pb = _product_blob(_parsed_product(prod))
        native = _native.apply_template(pb, tb, 32, 64, cap)
        py = _python_outcomes(template, prod, cap)
        assert native == py, (cap, native, py)
        assert len(native) <= cap


def test_inconsistent_aromatic_bond_falls_back():
    """An RHS ':' bond onto non-aromatic atoms makes the Python
    reference KeyError inside kekulize (embedding skipped); the native
    engine must decline (fall back) rather than accept the outcome —
    regression for a confirmed round-3 review finding."""
    template = "[c:1][N:2]>>[c:1]:[N:2]"
    prod = "CN(C)c1ccccc1"
    tb = _template_blob(template)
    pb = _product_blob(_parsed_product(prod))
    assert tb is not None and pb is not None
    native = _native.apply_template(pb, tb, 32, 64, 16)
    py = _python_outcomes(template, prod)
    assert native is None or native == py, (native, py)
    # public API agrees with the pure-Python result either way
    assert tuple(apply_retro_template(template, prod)) == py


def test_overflow_fields_fall_back():
    """int32-overflowing atom maps route to the Python path instead of
    wrapping (confirmed round-3 review finding)."""
    from llamole_tpu.chem.smiles import canonical_smiles
    big = "[CH4:4294967297]"
    assert _native.parse(big, sanitize=True, write=True) is None
    assert canonical_smiles(big) == big
    out = apply_retro_template("[C:1][C:2]>>[C:1].[C:2]",
                               "[CH3:99999999999]CC")
    assert isinstance(out, list)


def test_chiral_template_gated():
    assert _template_blob("[C@H:1]([N:2])[O:3]>>[C@@H:1]([N:2])[O:3]") is None
    # and the public API still answers via the Python path
    out = apply_retro_template("[C@:1]([F:2])>>[C@@:1].[F:2]",
                               "F[C@H](Cl)Br")
    assert isinstance(out, list)


def test_stereo_product_gated():
    mol = _parsed_product("N[C@@H](C)C(=O)O")
    assert _product_blob(mol) is None
    out = apply_retro_template("[C:1](=[O:2])[OH:3]>>[C:1](=[O:2])[O:3]C",
                               "N[C@@H](C)C(=O)O")
    assert isinstance(out, list)


def test_fuzz_template_mutations():
    """Mutated templates x products: whenever the native blob builds,
    outcomes must equal the Python path exactly."""
    rng = np.random.default_rng(53)
    alphabet = list("CNOScn[]()=#:123+-;@HDR")
    agreed = fired = 0
    for _ in range(300):
        base = TEMPLATES[int(rng.integers(0, len(TEMPLATES)))]
        s = list(base)
        for _ in range(int(rng.integers(0, 3))):
            op = rng.random()
            pos = int(rng.integers(0, len(s)))
            if op < 0.4 and len(s) > 4:
                del s[pos]
            elif op < 0.8:
                s[pos] = str(rng.choice(alphabet))
            else:
                s.insert(pos, str(rng.choice(alphabet)))
        template = "".join(s)
        tb = _template_blob(template)
        if tb is None:
            continue
        prod = PRODUCTS[int(rng.integers(0, len(PRODUCTS)))]
        pb = _product_blob(_parsed_product(prod))
        if pb is None:
            continue
        native = _native.apply_template(pb, tb, 32, 64, 16)
        if native is None:
            continue
        py = _python_outcomes(template, prod)
        assert native == py, (template, prod, native, py)
        agreed += 1
        fired += bool(native)
    assert agreed >= 140, agreed
    assert fired > 5, fired


def test_fuzz_random_products():
    """Random stereo-free products from corpus mutations against the
    full template list."""
    rng = np.random.default_rng(59)
    alphabet = list("CNOScnos()=#123Br")
    from llamole_tpu.chem.smiles import canonical_smiles
    agreed = 0
    for _ in range(260):
        base = PRODUCTS[int(rng.integers(0, len(PRODUCTS)))]
        s = list(base)
        for _ in range(int(rng.integers(0, 3))):
            pos = int(rng.integers(0, len(s)))
            if rng.random() < 0.5:
                s[pos] = str(rng.choice(alphabet))
            else:
                s.insert(pos, str(rng.choice(alphabet)))
        prod = canonical_smiles("".join(s))
        if prod is None:
            continue
        template = TEMPLATES[int(rng.integers(0, len(TEMPLATES)))]
        tb = _template_blob(template)
        try:
            pb = _product_blob(_parsed_product(prod))
        except SmilesError:
            continue
        if tb is None or pb is None:
            continue
        native = _native.apply_template(pb, tb, 32, 64, 16)
        if native is None:
            continue
        py = _python_outcomes(template, prod)
        assert native == py, (template, prod, native, py)
        agreed += 1
    assert agreed > 100, agreed


def test_public_api_uses_native_and_caches():
    out1 = apply_retro_template(
        "[C:1](=[O:2])-[O:3]-[C:4]>>[C:1](=[O:2])-[OH].[OH]-[C:4]",
        "CC(=O)OCC")
    assert out1 == ["CC(=O)O.CCO"], out1
    # deterministic across calls (cache + native agree)
    out2 = apply_retro_template(
        "[C:1](=[O:2])-[O:3]-[C:4]>>[C:1](=[O:2])-[OH].[OH]-[C:4]",
        "CC(=O)OCC")
    assert out1 == out2
