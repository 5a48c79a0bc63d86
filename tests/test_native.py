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
