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
