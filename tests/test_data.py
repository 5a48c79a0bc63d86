"""Data pipeline tests against the reference's shipped example records
(SURVEY.md §4a): aligner regex machinery, truncation invariants,
label masking, collation shapes."""

import json

import numpy as np
import pytest

from llamole_tpu.config import ModelArguments, DataArguments, TrainingArguments
from llamole_tpu.data.aligner import (
    align_dataset,
    convert_molqa_record,
    extract_all_smiles,
    extract_retro_products,
    insert_bodies,
    replace_smiles_with_rollback,
)
from llamole_tpu.data.collator import SeqGraphCollator
from llamole_tpu.data.loader import build_graph_bank, get_dataset
from llamole_tpu.data.processor import (
    encode_supervised_example,
    infer_seqlen,
    preprocess_examples,
)
from llamole_tpu.data.template import get_template
from llamole_tpu.data.tokenizer import ByteTokenizer
from llamole_tpu.utils.constants import IGNORE_INDEX, NO_LABEL_INDEX, SPECIAL_TOKENS

DRUG = "/root/reference/data/molqa_drug_examples.json"
TRAIN = "/root/reference/data/molqa_train_examples.json"


@pytest.fixture(scope="module")
def records():
    with open(TRAIN) as f:
        return json.load(f)


@pytest.fixture()
def tok():
    t = ByteTokenizer()
    t.add_special_tokens(SPECIAL_TOKENS)
    return t


def test_regex_extraction(records):
    text = records[0]["output"]
    smiles = extract_all_smiles(text)
    assert len(smiles) >= 1
    products = extract_retro_products(text)
    assert all(">>" not in p for p in products)
    # products are the retro-step targets: first is the designed molecule
    assert products[0] == smiles[0]


def test_rollback_rewrite(records):
    text = records[0]["output"]
    out = replace_smiles_with_rollback(text)
    assert "<mol_start>" not in out and "<mol_end>" not in out
    assert "<molecule><rollback_start>" in out
    assert out.count("<molecule>") == len(extract_all_smiles(text))


def test_insert_bodies_counts(records):
    rec = records[0]
    text = replace_smiles_with_rollback(rec["output"])
    labels = rec.get("retro", [])
    out = insert_bodies(text, 8, labels)
    assert out.count("<design_body>") == 8
    n_labeled = sum(1 for l in labels if l is not None)
    assert out.count("<retro_body>") == 8 * n_labeled


def test_align_dataset_ids(records):
    examples, id_to_smiles = align_dataset(records, 8)
    assert len(examples) == len(records)
    for ex in examples:
        for mid in ex["molecules"] + ex["retro_products"]:
            assert mid in id_to_smiles
        assert len(ex["property"]) == 10


def test_infer_seqlen_reference_cases():
    # target short -> source gets the rest
    assert infer_seqlen(10, 10, 100) == (90, 10)
    # source short -> target truncated to remainder
    assert infer_seqlen(10, 200, 100) == (10, 90)
    # both long -> proportional
    s, t = infer_seqlen(300, 300, 100)
    assert s + t == 100 and abs(s - t) <= 1


def test_encode_masks_specials_keeps_starts(records, tok):
    examples, id_to_smiles = align_dataset(records, 8)
    template = get_template("default", tok)
    ex = examples[0]
    retro_labels = [NO_LABEL_INDEX if l is None else l for l in ex["retro_labels"]]
    input_ids, labels, mols, prods, retro = encode_supervised_example(
        ex["prompt"], ex["response"], ex["system"], ex["molecules"],
        ex["retro_products"], retro_labels, template, tok, cutoff_len=4096)
    assert len(input_ids) == len(labels)
    ds = tok.token_to_id("<design_start>")
    rs = tok.token_to_id("<retro_start>")
    body = tok.token_to_id("<design_body>")
    mol = tok.token_to_id("<molecule>")
    # start tokens survive as labels (mmsupervised.py:241-245)
    assert any(l == ds for l in labels)
    # body/molecule tokens never appear as labels
    assert all(l not in (body, mol) for l in labels if l != IGNORE_INDEX or True)
    for i, t in enumerate(input_ids):
        if t == body or t == mol:
            assert labels[i] == IGNORE_INDEX
        if t == ds or t == rs:
            assert labels[i] == t
    # retro alignment: one product + label per retro_start in the encoding
    n_rs = sum(1 for t in input_ids if t == rs)
    assert len(prods) == len(retro) == n_rs


def test_truncation_balances_retro_tags(records, tok):
    examples, _ = align_dataset(records, 8)
    template = get_template("default", tok)
    ex = examples[0]
    retro_labels = [NO_LABEL_INDEX if l is None else l for l in ex["retro_labels"]]
    rs = tok.token_to_id("<retro_start>")
    re_ = tok.token_to_id("<retro_end>")
    for cutoff in (128, 256, 512, 1024, 2048):
        input_ids, labels, *_ = encode_supervised_example(
            ex["prompt"], ex["response"], ex["system"], ex["molecules"],
            ex["retro_products"], retro_labels, template, tok, cutoff_len=cutoff)
        assert len(input_ids) <= cutoff + 1
        starts = sum(1 for t in input_ids if t == rs)
        ends = sum(1 for t in input_ids if t == re_)
        assert starts == ends, f"cutoff={cutoff}: {starts} vs {ends}"


def test_full_pipeline_and_collation(records, tok):
    model_args = ModelArguments()
    data_args = DataArguments(dataset="molqa_train_examples",
                              dataset_dir="/root/reference/data",
                              template="default", cutoff_len=1024,
                              learned_query_size=8)
    bank, inputs = get_dataset(model_args, data_args, TrainingArguments(), tok)
    assert len(inputs) == len(records)
    max_nodes = max(g.n_nodes for g in bank.values())
    collator = SeqGraphCollator(
        tokenizer=tok, mol_id_to_graph=bank, max_len=1024,
        max_nodes=max_nodes, max_graphs=64, max_retro=64)
    batch = collator(inputs[:3])
    b, l = batch["input_ids"].shape
    assert b == 3 and l <= 1024
    assert batch["labels"].shape == (b, l)
    # every valid bank slot points at a <molecule> token
    mol_id = tok.token_to_id("<molecule>")
    for m in range(64):
        if batch["mol_valid"][m]:
            r, c = batch["mol_rows"][m], batch["mol_cols"][m]
            assert batch["input_ids"][r, c] == mol_id
    # retro labels valid where marked
    for r in range(64):
        if batch["retro_valid"][r]:
            assert batch["retro_labels"][r] >= 0
            rr, cc = batch["retro_rows"][r], batch["retro_cols"][r]
            assert batch["input_ids"][rr, cc] == tok.token_to_id("<retro_start>")
    # design slots
    assert (batch["design_graph_index"] >= 0).sum() >= 1


def test_chat_templates_render():
    msgs = [{"role": "user", "content": "hi"}]
    for name, needle in [("llama3", "<|start_header_id|>assistant"),
                         ("qwen", "<|im_start|>assistant"),
                         ("mistral", "[/INST]")]:
        t = get_template(name)
        text = t.render_prompt(msgs)
        assert needle in text
        assert "hi" in text


def test_multiturn_encoding_roundtrip(tok):
    template = get_template("default", tok)
    msgs = [
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
        {"role": "assistant", "content": "a2"},
    ]
    pairs = template.encode_multiturn(tok, msgs, system="sys")
    assert len(pairs) == 2
    text0 = tok.decode(pairs[0][0])
    assert "sys" in text0 and "q1" in text0
    assert "a2" in tok.decode(pairs[1][1])
