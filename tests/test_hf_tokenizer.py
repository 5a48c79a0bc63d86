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


# ---------------------------------------------------------------------------
# Full-scale llama3-style tokenizer (128k BPE vocab + 256 reserved
# specials) — VERDICT round-1 item 9: the 9-special-token add +
# embedding resize + template encode at REAL vocab size
# (reference loader.py:88-138 + model_utils/embedding.py:32-73).
# ---------------------------------------------------------------------------

LLAMA3_VOCAB = 128_000
LLAMA3_SPECIALS = 256


@pytest.fixture(scope="module")
def llama3_scale_dir(tmp_path_factory):
    """Construct a 128,256-token llama3-shaped tokenizer offline: 256
    byte-level symbols + programmatically generated BPE merges up to
    128k, then the llama3 reserved-special block."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    d = tmp_path_factory.mktemp("llama3_tok")
    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    assert len(alphabet) == 256
    vocab = {c: i for i, c in enumerate(alphabet)}
    merges = []
    idx = len(vocab)
    # 2-symbol merges (256^2 = 65,536), then 4-char pairs to 128k
    for a in alphabet:
        for b in alphabet:
            if idx >= LLAMA3_VOCAB:
                break
            vocab[a + b] = idx
            merges.append((a, b))
            idx += 1
        if idx >= LLAMA3_VOCAB:
            break
    two_char = [t for t in list(vocab) if len(t) == 2]
    i = 0
    while idx < LLAMA3_VOCAB:
        a, b = two_char[i % len(two_char)], two_char[(i * 7 + 1) % len(two_char)]
        if a + b not in vocab:
            vocab[a + b] = idx
            merges.append((a, b))
            idx += 1
        i += 1
    assert len(vocab) == LLAMA3_VOCAB

    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()

    specials = ["<|begin_of_text|>", "<|end_of_text|>",
                "<|start_header_id|>", "<|end_header_id|>", "<|eot_id|>"]
    specials += [f"<|reserved_special_token_{i}|>"
                 for i in range(LLAMA3_SPECIALS - len(specials))]
    from transformers import PreTrainedTokenizerFast
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<|begin_of_text|>",
        eos_token="<|eot_id|>")
    fast.add_special_tokens({"additional_special_tokens": specials},
                            replace_additional_special_tokens=False)
    assert len(fast) == LLAMA3_VOCAB + LLAMA3_SPECIALS
    fast.save_pretrained(str(d))

    # HF-layout llama checkpoint at this vocab (tiny hidden)
    import numpy as np
    from safetensors.numpy import save_file

    H, I = 32, 64
    gen = np.random.default_rng(0)
    tensors = {
        "model.embed_tokens.weight": gen.normal(
            size=(LLAMA3_VOCAB + LLAMA3_SPECIALS, H)).astype(np.float32),
        "model.norm.weight": np.ones((H,), np.float32),
        "lm_head.weight": gen.normal(
            size=(LLAMA3_VOCAB + LLAMA3_SPECIALS, H)).astype(np.float32),
    }
    for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
        dim = H if name != "k_proj" and name != "v_proj" else H // 2
        tensors[f"model.layers.0.self_attn.{name}.weight"] = gen.normal(
            size=(dim, H)).astype(np.float32)
    tensors["model.layers.0.input_layernorm.weight"] = np.ones((H,), np.float32)
    tensors["model.layers.0.post_attention_layernorm.weight"] = np.ones(
        (H,), np.float32)
    for name, shape in (("gate_proj", (I, H)), ("up_proj", (I, H)),
                        ("down_proj", (H, I))):
        tensors[f"model.layers.0.mlp.{name}.weight"] = gen.normal(
            size=shape).astype(np.float32)
    save_file(tensors, os.path.join(str(d), "model.safetensors"))
    with open(os.path.join(str(d), "config.json"), "w") as f:
        json.dump({
            "vocab_size": LLAMA3_VOCAB + LLAMA3_SPECIALS,
            "hidden_size": H, "intermediate_size": I,
            "num_hidden_layers": 1, "num_attention_heads": 4,
            "num_key_value_heads": 2, "rope_theta": 500000.0,
            "model_type": "llama",
        }, f)
    return str(d)


def test_full_scale_special_add_and_resize(llama3_scale_dir):
    import numpy as np

    from llamole_tpu.models.loader import load_llm

    args = ModelArguments(model_name_or_path=llama3_scale_dir,
                          new_special_tokens=",".join(SPECIAL_TOKENS))
    tok = load_tokenizer(args)
    # the 9 multimodal tokens land AFTER the 128,256 llama3 vocab
    ids = [tok.token_to_id(t) for t in SPECIAL_TOKENS]
    assert min(ids) >= LLAMA3_VOCAB + LLAMA3_SPECIALS
    assert len(set(ids)) == 9
    assert tok.vocab_size == LLAMA3_VOCAB + LLAMA3_SPECIALS + 9

    llm, params = load_llm(args, tok, __import__("jax").random.PRNGKey(0))
    emb = np.asarray(params["embed"]["weight"], np.float32)
    assert emb.shape[0] == tok.vocab_size
    # resized rows follow the noisy-mean init (embedding.py:32-73)
    mean = emb[:LLAMA3_VOCAB + LLAMA3_SPECIALS].mean(axis=0)
    new_rows = emb[LLAMA3_VOCAB + LLAMA3_SPECIALS:]
    assert np.abs(new_rows - mean[None, :]).max() < 0.2
    assert np.asarray(params["lm_head"]["w"]).shape[1] == tok.vocab_size


def test_full_scale_template_encode(llama3_scale_dir):
    args = ModelArguments(model_name_or_path=llama3_scale_dir,
                          new_special_tokens=",".join(SPECIAL_TOKENS))
    tok = load_tokenizer(args)
    template = get_template("llama3", tok)
    msgs = [{"role": "user",
             "content": "Design a molecule: <design_start><design_end>"},
            {"role": "assistant", "content": "Sure <molecule> done."}]
    pairs = template.encode_multiturn(tok, msgs)
    (src, tgt), = pairs
    # llama3 control markers are single real ids at full scale
    header = tok.token_to_id("<|start_header_id|>")
    assert header is not None and header in src
    assert tok.token_to_id("<molecule>") in tgt
    rt = tok.decode(src + tgt, skip_special_tokens=True)
    assert "Design a molecule" in rt
