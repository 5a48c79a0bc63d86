"""Pipeline-parallelism tests on the 8-virtual-device CPU mesh.

The GPipe schedule (parallel/pipeline.py) must match the plain
single-program forward exactly (same layer math via gllm.model
decoder_layer), compose with dp, and be differentiable (pipelined
backward through ppermute).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.models.gllm import LLM, LLMConfig
from llamole_tpu.models.gllm.model import forward, lm_loss
from llamole_tpu.models.gllm.stacked import stack_layers
from llamole_tpu.parallel import (
    create_mesh,
    pipeline_decoder_forward,
    pipeline_lm_loss,
    pipeline_param_pspecs,
    shard_params,
)


@pytest.fixture(scope="module")
def tiny_stacked():
    cfg = LLMConfig.tiny(vocab_size=64)
    cfg.num_layers = 4   # divisible by pp in {2, 4}
    model = LLM(cfg, dtype=jnp.float32)
    params = stack_layers(model.init(jax.random.PRNGKey(0)))
    return cfg, params


def _batch(cfg, b=4, s=12, seed=0):
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(1, cfg.vocab_size, size=(b, s)), jnp.int32)
    mask = np.ones((b, s), np.int32)
    mask[1, :3] = 0  # ragged left padding
    ids = ids.at[1, :3].set(0)
    mask = jnp.asarray(mask)
    positions = jnp.clip(jnp.cumsum(mask, -1) - 1, 0, None)
    return ids, mask, positions


@pytest.mark.parametrize("pp,M", [(2, 2), (4, 4), (2, 1)])
def test_pipeline_matches_forward(tiny_stacked, pp, M):
    cfg, params = tiny_stacked
    mesh = create_mesh(pp=pp)
    ids, mask, positions = _batch(cfg, b=4)
    sharded = shard_params(params, mesh, pipeline_param_pspecs(params))

    x = params["embed"]["weight"][ids]
    ref, _, _ = forward(params, cfg, input_ids=ids, attention_mask=mask)

    with jax.set_mesh(mesh):
        hidden = jax.jit(lambda p, xx: pipeline_decoder_forward(
            p, xx, mask, positions, cfg, mesh, num_microbatches=M))(
            sharded, x)
    # compare against the pre-final-norm hidden of the plain path: redo
    # the head here to match logits end-to-end instead
    from llamole_tpu.models.gllm.model import _rms_norm
    h = _rms_norm(hidden, params["final_norm"]["scale"], cfg.rms_norm_eps)
    logits = (h @ params["embed"]["weight"].T if cfg.tie_word_embeddings
              else h @ params["lm_head"]["w"])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_with_dp(tiny_stacked):
    cfg, params = tiny_stacked
    mesh = create_mesh(pp=2, dp=2)
    assert dict(mesh.shape)["pp"] == 2 and dict(mesh.shape)["dp"] == 2
    ids, mask, positions = _batch(cfg, b=4)
    sharded = shard_params(params, mesh, pipeline_param_pspecs(params))
    ref, _, _ = forward(params, cfg, input_ids=ids, attention_mask=mask)
    x = params["embed"]["weight"][ids]
    with jax.set_mesh(mesh):
        hidden = jax.jit(lambda p, xx: pipeline_decoder_forward(
            p, xx, mask, positions, cfg, mesh, num_microbatches=2))(
            sharded, x)
    from llamole_tpu.models.gllm.model import _rms_norm
    h = _rms_norm(hidden, params["final_norm"]["scale"], cfg.rms_norm_eps)
    logits = (h @ params["embed"]["weight"].T if cfg.tie_word_embeddings
              else h @ params["lm_head"]["w"])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_loss_and_grads_match(tiny_stacked):
    """Pipelined backward: grads of the pipelined CE must equal the
    plain path's grads on every stacked layer leaf."""
    cfg, params = tiny_stacked
    mesh = create_mesh(pp=2)
    ids, mask, positions = _batch(cfg, b=4)
    labels = jnp.where(mask > 0, ids, -100)
    sharded = shard_params(params, mesh, pipeline_param_pspecs(params))

    def ref_loss(p):
        logits, _, _ = forward(p, cfg, input_ids=ids, attention_mask=mask)
        return lm_loss(logits, labels)

    ref_l, ref_g = jax.value_and_grad(ref_loss)(params)

    with jax.set_mesh(mesh):
        pipe = jax.jit(jax.value_and_grad(
            lambda p: pipeline_lm_loss(
                p, cfg, mesh, ids, mask, labels, num_microbatches=2)))
        pl, pg = pipe(sharded)
    assert abs(float(pl) - float(ref_l)) < 1e-4
    flat_r = jax.tree_util.tree_leaves_with_path(ref_g)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(pg))
    checked = 0
    for path, leaf in flat_r:
        got = flat_p[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(leaf),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=str(path))
        checked += 1
    assert checked == len(flat_r)


def test_pipeline_validates_divisibility(tiny_stacked):
    cfg, params = tiny_stacked
    mesh = create_mesh(pp=2)
    ids, mask, positions = _batch(cfg, b=3)
    x = params["embed"]["weight"][ids]
    with pytest.raises(ValueError, match="microbatch"):
        pipeline_decoder_forward(params, x, mask, positions, cfg, mesh,
                                 num_microbatches=2)


def test_pipeline_requires_stacked():
    cfg = LLMConfig.tiny(vocab_size=32)
    params = LLM(cfg, dtype=jnp.float32).init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="stacked"):
        pipeline_param_pspecs(params)


@pytest.mark.slow
def test_composite_loss_with_pipeline(tmp_path):
    """The composite 3-term loss with the LLM pipelined over pp must
    match the plain path (loss and connector/LoRA grads)."""
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
    model_args = ModelArguments(model_name_or_path="", scan_layers=True)
    data_args = DataArguments(dataset="synth", dataset_dir=str(data_dir),
                              template="default", cutoff_len=256,
                              learned_query_size=8)
    ft_args = FinetuningArguments(lora_rank=4)

    def build():
        return build_graph_lm(model_args, data_args, ft_args, seed=0)

    model, frozen, trainable, tok = build()
    bank, inputs = get_dataset(model_args, data_args, None, tok)
    collator = SeqGraphCollator(
        tokenizer=tok, mol_id_to_graph=bank, max_len=256,
        max_nodes=model.graph_decoder.cfg.max_n_nodes,
        max_graphs=8, max_retro=8)
    batch = {k: jnp.asarray(v) for k, v in collator(inputs).items()}
    rng = jax.random.PRNGKey(0)

    def loss_of(m):
        def f(tr):
            loss, aux = m.loss_fn(tr, frozen, rng, batch)
            return loss
        return f

    ref_loss, ref_grads = jax.value_and_grad(loss_of(model))(trainable)

    # a second model instance (fresh jit cache) with the pipeline enabled
    model_pp, frozen_pp, trainable_pp, _ = build()
    mesh = create_mesh(pp=2)
    model_pp.enable_pipeline(mesh, num_microbatches=2)
    with jax.set_mesh(mesh):
        pp_loss, pp_grads = jax.value_and_grad(
            loss_of(model_pp))(trainable_pp)
    assert abs(float(pp_loss) - float(ref_loss)) < 2e-4
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_grads),
            jax.tree_util.tree_leaves_with_path(pp_grads)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4, err_msg=str(pa))


@pytest.mark.slow
def test_trainer_step_with_pipeline_mesh(tmp_path):
    """Trainer wiring: frozen LLM shards over pp, trainable stacked LoRA
    shards over pp, one optimizer step runs with a finite loss."""
    import json

    from llamole_tpu.config import (DataArguments, FinetuningArguments,
                                    ModelArguments, TrainingArguments)
    from llamole_tpu.data.collator import SeqGraphCollator
    from llamole_tpu.data.loader import get_dataset
    from llamole_tpu.models.loader import build_graph_lm
    from llamole_tpu.train.trainer import Trainer
    from tests.test_composite import SYNTH_RECORDS

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "synth.json", "w") as f:
        json.dump(SYNTH_RECORDS, f)
    model_args = ModelArguments(model_name_or_path="", scan_layers=True)
    data_args = DataArguments(dataset="synth", dataset_dir=str(data_dir),
                              template="default", cutoff_len=256,
                              learned_query_size=8)
    ft_args = FinetuningArguments(lora_rank=4)
    model, frozen, trainable, tok = build_graph_lm(
        model_args, data_args, ft_args, seed=0)
    bank, inputs = get_dataset(model_args, data_args, None, tok)
    collator = SeqGraphCollator(
        tokenizer=tok, mol_id_to_graph=bank, max_len=256,
        max_nodes=model.graph_decoder.cfg.max_n_nodes,
        max_graphs=8, max_retro=8)
    batch = collator(inputs)

    mesh = create_mesh(pp=2, dp=2)
    model.enable_pipeline(mesh, num_microbatches=2)
    targs = TrainingArguments(per_device_train_batch_size=2,
                              learning_rate=1e-3, mesh="pp:2,dp:2",
                              pipeline_microbatches=2)
    trainer = Trainer(model.loss_fn, frozen, targs, num_training_steps=2,
                      mesh=mesh)
    with jax.set_mesh(mesh):
        state = trainer.init_state(trainable, seed=0)
        placed = trainer._place_batch(batch)
        params, opt_state, rng, loss, aux, gnorm = trainer._jit_step(
            state.params, state.opt_state, state.rng, placed,
            trainer.frozen)
    assert np.isfinite(float(loss))
    # the frozen stacked LLM actually sharded its depth over pp
    llm_leaf = trainer.frozen["llm"]["layers_stacked"]["attn"]["q"]["w"]
    assert "pp" in str(llm_leaf.sharding.spec)


@pytest.mark.slow
def test_run_mmsft_with_pipeline_mesh(tmp_path):
    """Workflow-level wiring: mesh='pp:2,dp:2' + scan_layers trains end
    to end through run_mmsft (enable_pipeline fires before the first
    loss trace; trainer shards the stacked LLM over pp)."""
    import json

    from llamole_tpu.train.workflow import run_mmsft
    from tests.test_composite import SYNTH_RECORDS

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "synth.json", "w") as f:
        json.dump(SYNTH_RECORDS * 2, f)
    out_dir = tmp_path / "out"
    args = {
        "model_name_or_path": "",
        "dataset": "synth",
        "dataset_dir": str(data_dir),
        "template": "default",
        "cutoff_len": 384,
        "learned_query_size": 8,
        "do_train": True,
        "output_dir": str(out_dir),
        "per_device_train_batch_size": 2,
        "gradient_accumulation_steps": 1,
        "learning_rate": 1e-3,
        "max_steps": 2,
        "save_steps": 0,
        "logging_steps": 1,
        "scan_layers": True,
        "mesh": "pp:2,dp:2",
        "pipeline_microbatches": 2,
        "finetuning_type": "lora",
        "lora_rank": 4,
    }
    metrics = run_mmsft(args)
    assert np.isfinite(metrics["train_loss"])
