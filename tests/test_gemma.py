"""Gemma-2 family support: logit parity against the actual HF torch
Gemma2ForCausalLM (softcaps, sandwich norms, GeGLU, embedding scaling,
query_pre_attn_scalar, alternating sliding-window attention), decode
parity through the KV-cache path, scan-storage parity, and converter
round-trip. Reference analog: the base-LLM loading surface
(src/model/loader.py:148-220) — gemma2 is a beyond-reference family."""

import json

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from llamole_tpu.models.gllm import LLM, LLMConfig  # noqa: E402
from llamole_tpu.models.gllm.convert import load_hf_weights  # noqa: E402


def _tiny_hf_gemma2(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = Gemma2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        rope_theta=10000.0, attn_logit_softcapping=5.0,
        final_logit_softcapping=3.0,
        # deliberately != head_dim so the query scale is actually tested
        query_pre_attn_scalar=24.0,
        # window < test seq len so the even (local) layers really clip
        sliding_window=8,
        hidden_activation="gelu_pytorch_tanh", attention_bias=False,
        tie_word_embeddings=True, attn_implementation="eager")
    torch.manual_seed(0)
    model = Gemma2ForCausalLM(cfg).eval()
    d = tmp_path / "hf_gemma2"
    model.save_pretrained(str(d))
    return model, d


def _load_ours(d, dtype=None):
    dtype = dtype or jnp.float32
    with open(d / "config.json") as f:
        cfg = LLMConfig.from_hf_config(json.load(f))
    params = load_hf_weights(str(d), cfg, dtype=dtype)
    return LLM(cfg, dtype=dtype), params


@pytest.mark.slow
def test_gemma2_config_mapping(tmp_path):
    _, d = _tiny_hf_gemma2(tmp_path)
    with open(d / "config.json") as f:
        cfg = LLMConfig.from_hf_config(json.load(f))
    assert cfg.sandwich_norms and cfg.rms_norm_unit_offset
    assert cfg.scale_embeddings and cfg.tie_word_embeddings
    assert cfg.hidden_act == "gelu_tanh"
    assert cfg.attn_logit_softcap == 5.0
    assert cfg.final_logit_softcap == 3.0
    assert cfg.query_scale == 24.0
    assert cfg.sliding_window == 8
    # gemma2: even layers local, odd layers global
    assert not cfg.is_global_layer(0) and cfg.is_global_layer(1)


@pytest.mark.slow
def test_gemma2_logit_parity_vs_hf(tmp_path):
    torch = pytest.importorskip("torch")
    hf, d = _tiny_hf_gemma2(tmp_path)
    llm, params = _load_ours(d)

    rng = np.random.default_rng(1)
    # seq 16 > window 8: local layers actually clip history
    ids = rng.integers(1, 96, (2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits.float().numpy()
    logits, _, _ = llm(params, input_ids=jnp.asarray(ids),
                       attention_mask=jnp.ones_like(jnp.asarray(ids)))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_gemma2_greedy_decode_matches_hf(tmp_path):
    """Cache-path parity: our while_loop decode (with the sliding-window
    cache mask) must emit the same greedy tokens as HF generate."""
    torch = pytest.importorskip("torch")
    hf, d = _tiny_hf_gemma2(tmp_path)
    llm, params = _load_ours(d)

    rng = np.random.default_rng(2)
    ids = rng.integers(1, 96, (2, 12)).astype(np.int32)
    T = 10
    with torch.no_grad():
        ref = hf.generate(torch.tensor(ids, dtype=torch.long),
                          max_new_tokens=T, do_sample=False).numpy()
    ref_new = ref[:, ids.shape[1]:]
    out, _ = llm.generate(params, jax.random.PRNGKey(0),
                          jnp.asarray(ids),
                          jnp.ones_like(jnp.asarray(ids)),
                          max_new_tokens=T, do_sample=False)
    np.testing.assert_array_equal(np.asarray(out), ref_new)


@pytest.mark.slow
def test_gemma2_scan_storage_parity(tmp_path):
    """Stacked (scan-over-layers) storage must reproduce the per-layer
    loop exactly — the alternating local/global mask rides the scan via
    a traced per-layer flag."""
    _, d = _tiny_hf_gemma2(tmp_path)
    llm, params = _load_ours(d)
    from llamole_tpu.models.gllm.stacked import stack_layers
    stacked = stack_layers(params)

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 96, (2, 16)).astype(np.int32))
    mask = jnp.ones_like(ids)
    base, _, _ = llm(params, input_ids=ids, attention_mask=mask)
    scan, _, _ = llm(stacked, input_ids=ids, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(base), np.asarray(scan),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_gemma2_export_round_trip(tmp_path):
    """export_hf_weights(load_hf_weights(x)) reproduces the logits —
    the gemma2 sandwich-norm names survive the round trip."""
    _, d = _tiny_hf_gemma2(tmp_path)
    llm, params = _load_ours(d)
    from llamole_tpu.models.gllm.convert import export_hf_weights, to_hf_config
    out_dir = tmp_path / "exported"
    export_hf_weights(params, llm.cfg, str(out_dir))
    raw = to_hf_config(llm.cfg, params)
    assert raw["model_type"] == "gemma2"
    with open(out_dir / "config.json") as f:
        cfg2 = LLMConfig.from_hf_config(json.load(f))
    assert cfg2.sandwich_norms and cfg2.sliding_window == 8
    params2 = load_hf_weights(str(out_dir), cfg2, dtype=jnp.float32)

    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(1, 96, (1, 10)).astype(np.int32))
    a, _, _ = llm(params, input_ids=ids, attention_mask=jnp.ones_like(ids))
    b, _, _ = LLM(cfg2, dtype=jnp.float32)(params2, input_ids=ids,
                                           attention_mask=jnp.ones_like(ids))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_gemma2_composite_design():
    """The full multimodal GraphLM pipeline (decode -> re-forward ->
    connector -> GraphDiT -> SMILES) over a gemma-semantics base: the
    family knobs must survive the composite's embed-splice and
    trigger-token machinery."""
    from llamole_tpu.config import ModelArguments
    from llamole_tpu.data.tokenizer import load_tokenizer
    from llamole_tpu.models.composite import GenerationSettings, GraphLM
    from llamole_tpu.models.graphclip.model import GraphCLIP, GraphCLIPConfig
    from llamole_tpu.models.graphdit import GraphDiT, GraphDiTConfig
    from llamole_tpu.models.graphdit.config import build_data_info_from_smiles
    from llamole_tpu.models.loader import make_fallback_predictor
    from llamole_tpu.utils.constants import SPECIAL_TOKENS

    tok = load_tokenizer(ModelArguments(model_name_or_path=""),
                         generate_mode=True)
    cfg = LLMConfig.tiny(max(320, tok.vocab_size))
    cfg.hidden_act = "gelu_tanh"
    cfg.sandwich_norms = True
    cfg.rms_norm_unit_offset = True
    cfg.scale_embeddings = True
    cfg.attn_logit_softcap = 5.0
    cfg.final_logit_softcap = 3.0
    cfg.sliding_window = 8
    llm = LLM(cfg, dtype=jnp.float32)

    dit = GraphDiTConfig(hidden_size=32, depth=2, num_heads=4,
                         diffusion_steps=4, text_dim=768)
    info = build_data_info_from_smiles(["CCO", "c1ccccc1", "CC(=O)O"],
                                       max_n_nodes=16)
    decoder = GraphDiT(dit, info, dtype=jnp.float32)
    predictor = make_fallback_predictor()
    encoder = GraphCLIP(GraphCLIPConfig(num_layer=2, hidden_size=32))
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    frozen = {"llm": llm.init(keys[0]),
              "graph_decoder": decoder.init(keys[1]),
              "graph_predictor": predictor.init(keys[2]),
              "graph_encoder": encoder.init(keys[3])}
    model = GraphLM(llm=llm, graph_decoder=decoder,
                    graph_predictor=predictor, graph_encoder=encoder,
                    tokenizer=tok,
                    token_id_dict={t: tok.token_to_id(t)
                                   for t in SPECIAL_TOKENS},
                    finetuning_type="freeze")
    trainable = model.init_trainable(keys[4], frozen)

    ids = np.asarray([tok.encode("Design a small molecule.")], np.int32)
    props = np.full((1, 10), np.nan, np.float32)
    _, smiles = model.design_molecule(
        frozen, trainable, jax.random.PRNGKey(2), ids,
        np.ones_like(ids), props,
        gen=GenerationSettings(max_new_tokens=8, do_sample=False))
    assert len(smiles) == 1  # random weights: None or a SMILES string


def test_gemma_template_renders():
    """System text folds INSIDE the first user turn (gemma has no
    system role; bare text between <bos> and the first turn marker is
    out-of-distribution for instruction-tuned gemma)."""
    from llamole_tpu.data.template import get_template
    t = get_template("gemma")
    text = t.render_prompt([{"role": "user", "content": "hi"}],
                           system="be brief")
    assert text == ("<bos><start_of_turn>user\nbe brief\n\nhi"
                    "<end_of_turn>\n<start_of_turn>model\n")
    # encode_multiturn folds identically (training/inference agreement)
    class _Tok:
        def encode(self, text, add_special_tokens=False):
            return [ord(c) for c in text]
    pairs = t.encode_multiturn(_Tok(), [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "yo"}], system="be brief")
    src = "".join(chr(c) for c in pairs[0][0])
    assert src.startswith("<bos><start_of_turn>user\nbe brief\n\nhi")


def test_gemma1_logit_parity_vs_hf(tmp_path):
    """gemma-1 (model_type 'gemma'): GeGLU + unit-offset norms + scaled
    embeds, but NO sandwich norms / softcaps / sliding window."""
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_act="gelu_pytorch_tanh",
        attention_bias=False, tie_word_embeddings=True,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = GemmaForCausalLM(cfg).eval()
    d = tmp_path / "hf_gemma1"
    hf.save_pretrained(str(d))

    llm, params = _load_ours(d)
    assert not llm.cfg.sandwich_norms
    assert llm.cfg.attn_logit_softcap is None
    assert llm.cfg.sliding_window is None
    assert llm.cfg.rms_norm_unit_offset and llm.cfg.scale_embeddings

    rng = np.random.default_rng(5)
    ids = rng.integers(1, 96, (2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.tensor(ids, dtype=torch.long)).logits.float().numpy()
    logits, _, _ = llm(params, input_ids=jnp.asarray(ids),
                       attention_mask=jnp.ones_like(jnp.asarray(ids)))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_gemma2_tp_sharded_forward_matches_single(tmp_path):
    """Gemma-2 under a dp2 x tp4 mesh == single device: the megatron
    pspecs must replicate the sandwich norms and shard head_dim-256
    projections while softcaps/sliding masks stay correct."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from llamole_tpu.models.gllm.model import forward
    from llamole_tpu.parallel import create_mesh
    from llamole_tpu.parallel.sharding import llm_param_pspecs, shard_params

    _, d = _tiny_hf_gemma2(tmp_path)
    llm, params = _load_ours(d)
    mesh = create_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh, llm_param_pspecs(params))
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(1, 96, (2, 16)).astype(np.int32))
    ref, _, _ = llm(params, input_ids=ids)
    with jax.set_mesh(mesh):
        ids_sh = jax.device_put(ids, NamedSharding(mesh, P("dp", None)))
        out, _, _ = jax.jit(
            lambda p, i: forward(p, llm.cfg, input_ids=i))(sharded, ids_sh)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_gemma2_lora_training_step(tmp_path):
    """LoRA fine-tuning math over a gemma-2 base: adapters overlay the
    projections, gradients flow ONLY to lora+connector leaves, and one
    optimizer step moves the loss — the sandwich norms/softcaps must
    ride the loss path untouched."""
    import optax
    from llamole_tpu.models.gllm.lora import init_lora

    _, d = _tiny_hf_gemma2(tmp_path)
    llm, params = _load_ours(d)
    lora = init_lora(jax.random.PRNGKey(0), llm.cfg, rank=4,
                     targets=("q", "v"))

    rng = np.random.default_rng(8)
    ids = jnp.asarray(rng.integers(1, 96, (2, 12)).astype(np.int32))
    labels = jnp.asarray(rng.integers(1, 96, (2, 12)).astype(np.int32))

    from llamole_tpu.models.gllm.model import forward, lm_loss

    def loss_fn(lo):
        logits, _, _ = forward(params, llm.cfg, input_ids=ids, lora=lo,
                               lora_scale=2.0, train=True)
        return lm_loss(logits, labels)

    tx = optax.adam(1e-2)
    opt = tx.init(lora)
    l0, g = jax.value_and_grad(loss_fn)(lora)
    gnorm = optax.global_norm(g)
    assert float(gnorm) > 0
    updates, opt = tx.update(g, opt, lora)
    lora2 = optax.apply_updates(lora, updates)
    l1 = loss_fn(lora2)
    assert float(l1) < float(l0)


def test_gemma3_accepted_with_own_semantics():
    """gemma-3 checkpoints load with gemma-3 semantics (q/k norms, dual
    rope, no softcaps) — NOT as gemma-2, which would silently produce
    wrong logits (full parity coverage: tests/test_gemma3.py). Unknown
    future variants still refuse loudly."""
    cfg = LLMConfig.from_hf_config({
        "model_type": "gemma3_text", "vocab_size": 96,
        "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4})
    assert cfg.qk_norm and cfg.sandwich_norms
    assert cfg.attn_logit_softcap is None
    assert cfg.rope_local_base_freq == 10000.0
    with pytest.raises(ValueError, match="unsupported gemma variant"):
        LLMConfig.from_hf_config({
            "model_type": "gemma4", "vocab_size": 96,
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4})
