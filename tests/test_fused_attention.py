"""Fused qk-norm + masked MHA kernel (VERDICT round-1 item 7).

Correctness in interpret mode against the jnp composition the training
path uses; the TPU win is measured end-to-end by bench.py (1309 vs 1233
graph-steps/s at the reference denoiser shape, NOTES_ROUND3.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.ops.pallas.fused_attention import (
    _fused_attention_reference,
    fused_block_attention,
)


@pytest.mark.parametrize("b,n,h,heads", [
    (5, 50, 128, 4),      # odd batch, unpadded N
    (8, 64, 256, 8),      # aligned
    (3, 17, 64, 2),       # tiny, heavy padding
])
def test_fused_attention_matches_reference(b, n, h, heads):
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * h)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, n)) > 0.3)
    mask = mask.at[:, 0].set(True)  # every graph keeps >= 1 node
    dh = h // heads
    qn = {"scale": jnp.asarray(rng.normal(size=(dh,)).astype(np.float32)),
          "bias": jnp.asarray(rng.normal(size=(dh,)).astype(np.float32))}
    kn = {"scale": jnp.asarray(rng.normal(size=(dh,)).astype(np.float32)),
          "bias": jnp.asarray(rng.normal(size=(dh,)).astype(np.float32))}
    ref = _fused_attention_reference(qkv, mask, qn, kn, heads)
    out = fused_block_attention(qkv, mask, qn, kn, heads, interpret=True)
    err = float(jnp.max(jnp.abs((out - ref) * mask[:, :, None])))
    assert err < 1e-4, err


def test_denoiser_train_path_unchanged():
    """train=True must keep the differentiable jnp composition."""
    from llamole_tpu.models.graphdit import GraphDiT, GraphDiTConfig
    from llamole_tpu.models.graphdit.config import build_data_info_from_smiles
    from llamole_tpu.models.graphdit.denoiser import apply_denoiser

    cfg = GraphDiTConfig(hidden_size=64, depth=2, num_heads=4,
                         diffusion_steps=8, text_dim=16)
    info = build_data_info_from_smiles(["CCO", "c1ccccc1"], max_n_nodes=8)
    model = GraphDiT(cfg, info)
    params = model.init(jax.random.PRNGKey(0))
    B, N = 2, 8
    X = jnp.zeros((B, N, cfg.Xdim)).at[:, :, 1].set(1.0)
    E = jnp.zeros((B, N, N, cfg.Edim)).at[:, :, :, 0].set(1.0)
    mask = jnp.ones((B, N), bool)
    y = jnp.full((B, cfg.ydim), jnp.nan)
    txt = jnp.zeros((B, cfg.text_dim))
    t = jnp.full((B,), 0.5)

    def loss(p):
        ax, ex = apply_denoiser(p, cfg, X, E, mask, y, txt, t, train=True,
                                rng=jax.random.PRNGKey(1))
        return jnp.sum(ax ** 2) + jnp.sum(ex ** 2)

    grads = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(total) and total > 0
