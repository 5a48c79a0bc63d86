"""Sparse-MoE MLP tests: routing exactness, aux loss, gradient flow,
expert-parallel sharding on the 8-virtual-device CPU mesh.

The reference supports MoE base models via HF + model_utils/moe.py
(aux-loss registration, ZeRO-3 leaf modules); here the MoE layer is
first-party (gllm/model.py _moe_mlp) with static-capacity GShard
dispatch and an 'ep' mesh axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.models.gllm import LLM, LLMConfig
from llamole_tpu.models.gllm.model import _moe_mlp, forward, lm_loss
from llamole_tpu.parallel import create_mesh, llm_param_pspecs, shard_params


@pytest.fixture(scope="module")
def moe_model():
    cfg = LLMConfig.tiny_moe(vocab_size=64, num_experts=4, top_k=2)
    model = LLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _ids(cfg, b=2, s=10, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(1, cfg.vocab_size, size=(b, s)), jnp.int32)


def test_moe_params_shape(moe_model):
    model, params = moe_model
    mlp = params["layers"][0]["mlp"]
    E, h, inter = 4, model.cfg.hidden_size, model.cfg.intermediate_size
    assert mlp["router"]["w"].shape == (h, E)
    assert mlp["experts"]["gate"].shape == (E, h, inter)
    assert mlp["experts"]["down"].shape == (E, inter, h)


def test_moe_forward_and_aux(moe_model):
    model, params = moe_model
    ids = _ids(model.cfg)
    logits, hidden, _, aux = forward(params, model.cfg, input_ids=ids,
                                     return_moe_aux=True)
    assert logits.shape == (2, 10, 64)
    assert np.isfinite(np.asarray(logits)).all()
    # load-balancing loss: ~1.0 for a near-uniform random router, and
    # >= 1.0 by Cauchy-Schwarz when f ~= P; generous band either way
    assert 0.5 < float(aux) < float(model.cfg.num_layers) * 4.0


def test_single_expert_equals_dense_mlp():
    """E=1, k=1, ample capacity: routing is the identity and the MoE
    layer must equal a dense SwiGLU with the same weights (combine
    weight is exactly 1 after top-k renormalization)."""
    cfg = LLMConfig.tiny_moe(vocab_size=32, num_experts=1, top_k=1)
    cfg.moe_capacity_factor = 2.0
    model = LLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    mlp = params["layers"][0]["mlp"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, cfg.hidden_size))
    y, aux = _moe_mlp(mlp, x, cfg)
    g = mlp["experts"]["gate"][0]
    u = mlp["experts"]["up"][0]
    d = mlp["experts"]["down"][0]
    expect = (jax.nn.silu(x @ g) * (x @ u)) @ d
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)
    assert abs(float(aux) - 1.0) < 1e-5  # E * 1 * 1


def test_capacity_drops_are_finite():
    """Tiny capacity forces overflow drops; outputs stay finite and
    dropped units contribute zero (not NaN)."""
    cfg = LLMConfig.tiny_moe(vocab_size=32, num_experts=2, top_k=1)
    cfg.moe_capacity_factor = 0.1
    model = LLM(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    y, aux = _moe_mlp(params["layers"][0]["mlp"],
                      jax.random.normal(jax.random.PRNGKey(2), (2, 16, 64)),
                      cfg)
    assert np.isfinite(np.asarray(y)).all()


def test_moe_grads_flow_router_and_experts(moe_model):
    model, params = moe_model
    ids = _ids(model.cfg)
    labels = ids

    def loss(p):
        logits, _, _, aux = forward(p, model.cfg, input_ids=ids,
                                    return_moe_aux=True)
        return lm_loss(logits, labels) + model.cfg.moe_aux_loss_coef * aux

    grads = jax.grad(loss)(params)
    g_router = grads["layers"][0]["mlp"]["router"]["w"]
    g_exp = grads["layers"][0]["mlp"]["experts"]["gate"]
    assert float(jnp.abs(g_router).max()) > 0
    assert float(jnp.abs(g_exp).max()) > 0


def test_moe_generate_runs(moe_model):
    model, params = moe_model
    ids = _ids(model.cfg, b=2, s=6)
    mask = jnp.ones_like(ids)
    out, done = model.generate(params, jax.random.PRNGKey(0), ids, mask,
                               max_new_tokens=5, do_sample=False,
                               temperature=0.0, pad_id=0)
    assert out.shape == (2, 5)


def test_moe_ep_sharded_matches_unsharded(moe_model):
    """Expert-parallel: loss and grads on a dp x ep mesh match the
    unsharded computation."""
    model, params = moe_model
    cfg = model.cfg
    ids = _ids(cfg, b=4, s=8)
    labels = ids

    def loss(p):
        logits, _, _, aux = forward(p, cfg, input_ids=ids,
                                    return_moe_aux=True)
        return lm_loss(logits, labels) + cfg.moe_aux_loss_coef * aux

    ref_l, ref_g = jax.value_and_grad(loss)(params)

    mesh = create_mesh(dp=2, ep=4)
    assert dict(mesh.shape)["ep"] == 4
    pspecs = llm_param_pspecs(params, ep_axis="ep")
    sharded = shard_params(params, mesh, pspecs)
    with jax.set_mesh(mesh):
        sl, sg = jax.jit(jax.value_and_grad(loss))(sharded)
    assert abs(float(sl) - float(ref_l)) < 1e-4
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(sg)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=str(pa))


def test_moe_stacked_scan_layers(moe_model):
    """Stacked-layout MoE params run through the scan-over-layers path
    and match the list layout."""
    from llamole_tpu.models.gllm.stacked import stack_layers

    model, params = moe_model
    ids = _ids(model.cfg)
    ref, _, _ = forward(params, model.cfg, input_ids=ids)
    out, _, _ = forward(stack_layers(params), model.cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_aux_loss_matches_hf_magnitude(moe_model):
    """At near-uniform routing the pooled aux must be ~top_k (HF
    load_balancing_loss_func magnitude), not ~num_layers."""
    model, params = moe_model
    ids = _ids(model.cfg, b=8, s=32)
    _, _, _, aux = forward(params, model.cfg, input_ids=ids,
                           return_moe_aux=True)
    k = model.cfg.num_experts_per_tok
    assert 0.5 * k < float(aux) < 2.5 * k, float(aux)


def test_padding_excluded_from_routing(moe_model):
    """Pad tokens must not consume expert capacity or shift the aux
    loss: the valid-token outputs of a padded batch equal those of the
    unpadded batch."""
    from llamole_tpu.models.gllm.model import _moe_mlp

    model, params = moe_model
    cfg = model.cfg
    mlp = params["layers"][0]["mlp"]
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, cfg.hidden_size))
    y_ref, aux_ref = _moe_mlp(mlp, x, cfg)
    # append 8 pad positions with garbage embeddings
    pad = 100.0 * jax.random.normal(jax.random.PRNGKey(4),
                                    (1, 8, cfg.hidden_size))
    xp = jnp.concatenate([x, pad], axis=1)
    valid = jnp.concatenate([jnp.ones((8,), bool), jnp.zeros((8,), bool)])
    y_pad, aux_pad = _moe_mlp(mlp, xp, cfg, token_valid=valid)
    np.testing.assert_allclose(np.asarray(y_pad[:, :8]), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    assert abs(float(aux_pad) - float(aux_ref)) < 1e-5


def test_init_lora_drops_mlp_targets_for_moe(moe_model):
    from llamole_tpu.models.gllm import init_lora

    model, _ = moe_model
    lora = init_lora(jax.random.PRNGKey(0), model.cfg, rank=4)
    layer = lora["layers"][0]
    assert set(layer["attn"].keys()) == {"q", "k", "v", "o"}
    assert layer["mlp"] == {}


def test_enable_pipeline_rejects_moe(moe_model):
    from llamole_tpu.models.loader import make_fallback_predictor
    # a minimal GraphLM shell just to exercise the guard
    from llamole_tpu.models.composite import GraphLM

    model, _ = moe_model
    glm = GraphLM.__new__(GraphLM)
    glm.llm = model
    glm._loss_traced = False
    with pytest.raises(ValueError, match="ep axis"):
        GraphLM.enable_pipeline(glm, mesh=None)


def test_trainer_shards_experts_over_ep(moe_model):
    """mesh='ep:4,dp:2' must actually shard expert weights (they were
    silently replicated before the ep wiring)."""
    from llamole_tpu.config import TrainingArguments
    from llamole_tpu.train.trainer import Trainer

    model, params = moe_model
    mesh = create_mesh(dp=2, ep=4)
    frozen = {"llm": params}
    args = TrainingArguments(learning_rate=1e-3, mesh="ep:4,dp:2")
    trainer = Trainer(lambda tr, fz, rng, b: (jnp.zeros(()), {}), frozen,
                      args, num_training_steps=1, mesh=mesh)
    leaf = trainer.frozen["llm"]["layers"][0]["mlp"]["experts"]["gate"]
    assert "ep" in str(leaf.sharding.spec)


def test_merge_lora_on_moe_params(moe_model):
    """merge_lora must handle MoE layers (empty mlp adapter group,
    router/experts untouched)."""
    from llamole_tpu.models.gllm import init_lora, merge_lora

    model, params = moe_model
    lora = init_lora(jax.random.PRNGKey(1), model.cfg, rank=4)
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    merged = merge_lora(params, lora, scale=2.0)
    # attention weights changed; experts/router byte-identical
    assert not np.allclose(
        np.asarray(merged["layers"][0]["attn"]["q"]["w"]),
        np.asarray(params["layers"][0]["attn"]["q"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(merged["layers"][0]["mlp"]["experts"]["gate"]),
        np.asarray(params["layers"][0]["mlp"]["experts"]["gate"]))


def test_quantize_llm_params_moe_safe(moe_model):
    """quantize_llm_params must not choke on the MoE mlp structure:
    attention quantizes, router/experts pass through unquantized."""
    from llamole_tpu.models.gllm.quantize import quantize_llm_params
    from llamole_tpu.models.gllm.stacked import stack_layers

    model, params = moe_model
    for tree in (params, stack_layers(params)):
        q = quantize_llm_params(tree)
        layers = (q["layers"][0] if "layers" in q else q["layers_stacked"])
        assert "w_q" in layers["attn"]["q"]
        assert "experts" in layers["mlp"]
        assert "router" in layers["mlp"]
    ids = _ids(model.cfg, b=2, s=6)
    logits, _, _ = forward(quantize_llm_params(params), model.cfg,
                           input_ids=ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_pipeline_rejects_moe_directly(moe_model):
    from llamole_tpu.models.gllm.stacked import stack_layers
    from llamole_tpu.parallel import pipeline_decoder_forward

    model, params = moe_model
    mesh = create_mesh(pp=2)
    st = stack_layers(params)
    x = jnp.zeros((2, 8, model.cfg.hidden_size))
    mask = jnp.ones((2, 8), jnp.int32)
    with pytest.raises(ValueError, match="ep axis"):
        pipeline_decoder_forward(st, x, mask, mask, model.cfg, mesh,
                                 num_microbatches=2, train=True)


def test_model_args_moe_knobs():
    """ModelArguments.num_experts builds an MoE LLM from scratch."""
    from llamole_tpu.config import ModelArguments
    from llamole_tpu.data.tokenizer import load_tokenizer
    from llamole_tpu.models.loader import load_llm

    margs = ModelArguments(model_name_or_path="", num_experts=2,
                           num_experts_per_tok=1)
    tok = load_tokenizer(margs)
    llm, params = load_llm(margs, tok, jax.random.PRNGKey(0))
    assert llm.cfg.num_experts == 2
    assert "experts" in params["layers"][0]["mlp"]


def test_router_aux_loss_coef_from_hf_config():
    """A Mixtral checkpoint's router_aux_loss_coef (HF default 0.001)
    must be honored instead of the hardcoded 0.02 (reference honors the
    HF config via model_utils/moe.py:69-71)."""
    raw = {"vocab_size": 32000, "hidden_size": 64,
           "intermediate_size": 128, "num_hidden_layers": 2,
           "num_attention_heads": 4, "num_local_experts": 4,
           "num_experts_per_tok": 2, "router_aux_loss_coef": 0.001}
    cfg = LLMConfig.from_hf_config(raw)
    assert cfg.num_experts == 4
    assert cfg.moe_aux_loss_coef == pytest.approx(0.001)
    # absent key keeps the default
    raw.pop("router_aux_loss_coef")
    assert LLMConfig.from_hf_config(raw).moe_aux_loss_coef == \
        pytest.approx(0.02)


def test_moe_aux_loss_coef_model_args_override():
    """ModelArguments.moe_aux_loss_coef overrides the config value
    (reference exposes the same knob, model_utils/moe.py:69-71)."""
    from llamole_tpu.config import ModelArguments
    from llamole_tpu.data.tokenizer import load_tokenizer
    from llamole_tpu.models.loader import load_llm

    margs = ModelArguments(model_name_or_path="", num_experts=2,
                           num_experts_per_tok=1, moe_aux_loss_coef=0.005)
    tok = load_tokenizer(margs)
    llm, _ = load_llm(margs, tok, jax.random.PRNGKey(0))
    assert llm.cfg.moe_aux_loss_coef == pytest.approx(0.005)


def test_init_lora_moe_all_mlp_targets_raises(moe_model):
    """MLP-only LoRA targets on an MoE config must raise, not silently
    produce an empty (no-op) adapter."""
    from llamole_tpu.models.gllm import init_lora

    model, _ = moe_model
    with pytest.raises(ValueError, match="MoE"):
        init_lora(jax.random.PRNGKey(0), model.cfg, rank=4,
                  targets=("gate", "up", "down"))


def test_tp_and_ep_shardings_coexist(moe_model):
    """2D model sharding: attention tp + experts ep on one mesh; loss
    and grads match the unsharded computation."""
    model, params = moe_model
    cfg = model.cfg
    ids = _ids(cfg, b=2, s=8)

    def loss(p):
        logits, _, _, aux = forward(p, cfg, input_ids=ids,
                                    return_moe_aux=True)
        return lm_loss(logits, ids) + cfg.moe_aux_loss_coef * aux

    ref_l, ref_g = jax.value_and_grad(loss)(params)
    mesh = create_mesh(tp=2, ep=4)
    pspecs = llm_param_pspecs(params, ep_axis="ep")
    sharded = shard_params(params, mesh, pspecs)
    # attention q sharded over tp AND experts over ep simultaneously
    assert "tp" in str(sharded["layers"][0]["attn"]["q"]["w"].sharding.spec)
    assert "ep" in str(
        sharded["layers"][0]["mlp"]["experts"]["gate"].sharding.spec)
    with jax.set_mesh(mesh):
        sl, sg = jax.jit(jax.value_and_grad(loss))(sharded)
    assert abs(float(sl) - float(ref_l)) < 1e-4
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves_with_path(sg)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-4, err_msg=str(pa))


def test_composite_loss_with_moe_llm(tmp_path):
    """GraphLM.loss_fn routes through return_moe_aux for MoE LLMs and
    folds the balancing term into the LM loss."""
    import json

    from llamole_tpu.config import (DataArguments, FinetuningArguments,
                                    ModelArguments)
    from llamole_tpu.data.collator import SeqGraphCollator
    from llamole_tpu.data.loader import get_dataset
    from llamole_tpu.models.loader import build_graph_lm
    from tests.test_composite import SYNTH_RECORDS

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "synth.json", "w") as f:
        json.dump(SYNTH_RECORDS, f)
    model_args = ModelArguments(model_name_or_path="", num_experts=2,
                                num_experts_per_tok=1)
    data_args = DataArguments(dataset="synth", dataset_dir=str(data_dir),
                              template="default", cutoff_len=256,
                              learned_query_size=8)
    model, frozen, trainable, tok = build_graph_lm(
        model_args, data_args, FinetuningArguments(lora_rank=4), seed=0)
    assert model.llm.cfg.num_experts == 2
    bank, inputs = get_dataset(model_args, data_args, None, tok)
    collator = SeqGraphCollator(
        tokenizer=tok, mol_id_to_graph=bank, max_len=256,
        max_nodes=model.graph_decoder.cfg.max_n_nodes,
        max_graphs=8, max_retro=8)
    batch = {k: jnp.asarray(v) for k, v in collator(inputs).items()}
    loss, aux = model.loss_fn(trainable, frozen, jax.random.PRNGKey(0),
                              batch)
    assert np.isfinite(float(loss))
    # router grads flow through the composite loss (aux term active)
    g = jax.grad(lambda fz: model.loss_fn(
        trainable, fz, jax.random.PRNGKey(0), batch)[0])(frozen)
    router_g = g["llm"]["layers"][0]["mlp"]["router"]["w"]
    assert float(jnp.abs(router_g).max()) > 0
