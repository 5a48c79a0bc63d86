"""HFTokenizer adapter test: build a real tokenizers-backed tokenizer
locally (no network), load through the standard path, and run the
data pipeline with it."""

import json
import os

import pytest

tokenizers = pytest.importorskip("tokenizers")
transformers = pytest.importorskip("transformers")

from llamole_tpu.config import ModelArguments  # noqa: E402
from llamole_tpu.data.template import get_template  # noqa: E402
from llamole_tpu.data.tokenizer import HFTokenizer, load_tokenizer  # noqa: E402
from llamole_tpu.utils.constants import SPECIAL_TOKENS  # noqa: E402


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    """Train a tiny byte-level BPE and save it in HF format."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    d = tmp_path_factory.mktemp("tok")
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600,
        special_tokens=["<unk>", "<s>", "</s>",
                        "<|begin_of_text|>", "<|start_header_id|>",
                        "<|end_header_id|>", "<|eot_id|>"])
    corpus = [
        "Design a molecule that inhibits the target protein.",
        "To synthesize CCO, follow these procedures: mix and heat.",
        "The applied reaction is CC(=O)Oc1ccccc1C(=O)O with reactants.",
    ] * 20
    tok.train_from_iterator(corpus, trainer)
    from transformers import PreTrainedTokenizerFast
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>")
    fast.save_pretrained(str(d))
    return str(d)


def test_load_and_specials(hf_dir):
    args = ModelArguments(model_name_or_path=hf_dir,
                          new_special_tokens=",".join(SPECIAL_TOKENS))
    tok = load_tokenizer(args)
    assert isinstance(tok, HFTokenizer)
    # all 9 multimodal control tokens encode to single ids
    ids = {t: tok.token_to_id(t) for t in SPECIAL_TOKENS}
    assert len(set(ids.values())) == 9
    enc = tok.encode("<design_start><design_body><design_end>")
    assert enc == [ids["<design_start>"], ids["<design_body>"],
                   ids["<design_end>"]]
    assert tok.eos_token_id is not None and tok.pad_token_id is not None


def test_llama3_template_with_hf_tokenizer(hf_dir):
    args = ModelArguments(model_name_or_path=hf_dir,
                          new_special_tokens=",".join(SPECIAL_TOKENS))
    tok = load_tokenizer(args)
    # llama3 control markers were trained into the vocab as specials
    template = get_template("llama3", tok)
    msgs = [{"role": "user", "content": "Design a molecule."},
            {"role": "assistant", "content": "Sure: <molecule>."}]
    pairs = template.encode_multiturn(tok, msgs)
    assert len(pairs) == 1
    src, tgt = pairs[0]
    assert len(src) > 0 and len(tgt) > 0
    assert tok.token_to_id("<molecule>") in tgt
    text = tok.decode(src + tgt, skip_special_tokens=True)
    assert "Design a molecule." in text


def test_pipeline_with_hf_tokenizer(hf_dir, tmp_path):
    from llamole_tpu.config import DataArguments
    from llamole_tpu.data.loader import get_dataset

    args = ModelArguments(model_name_or_path=hf_dir,
                          new_special_tokens=",".join(SPECIAL_TOKENS))
    tok = load_tokenizer(args)
    data_args = DataArguments(dataset="molqa_train_examples",
                              dataset_dir="data", template="llama3",
                              cutoff_len=1024, learned_query_size=8)
    bank, inputs = get_dataset(args, data_args, None, tok)
    assert inputs
    body = tok.token_to_id("<design_body>")
    assert any(body in ex["input_ids"] for ex in inputs)
