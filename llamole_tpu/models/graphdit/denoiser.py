"""The GraphDiT denoiser: an AdaLN-modulated transformer over joint
node‖edge-row tokens.

Architecture parity with the reference Transformer
(graph_decoder/transformer.py:24-186, layers.py:23-116,
conditions.py:19-123):

  token_i = [X_i ‖ E_i,1..n] -> Linear -> LN        (x_embedder)
  c = t_emb + y_emb + txt_emb                        (conditioning)
  depth x Block: x += gate ⊙ mod(LN(attn(x)), s, b)  (post-attn LN, AdaLN
                 x += gate ⊙ mod(LN(mlp(x)), s, b)    with Softsign output)
  OutputLayer: residual atom/bond logits, masked + symmetrized

All matmuls run in the caller's dtype (bf16 on TPU) with f32 layer norms
and f32 attention logits.
"""

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...ops.attention import masked_attention
from ...ops.nn import (
    dense,
    dense_init,
    embedding_init,
    layer_norm,
    layer_norm_init,
    mlp_apply,
    mlp_init,
    softsign,
)
from .config import GraphDiTConfig


def init_denoiser(key, cfg: GraphDiTConfig, dtype=jnp.float32) -> Dict:
    n = cfg.max_n_nodes
    in_dim = cfg.Xdim + n * cfg.Edim
    final_dim = cfg.Xdim + n * cfg.Edim
    h = cfg.hidden_size
    keys = jax.random.split(key, 16 + cfg.depth)

    params: Dict = {
        "x_embedder": {
            "linear": dense_init(keys[0], in_dim, h, bias=False, dtype=dtype),
            "norm": layer_norm_init(h, affine=True, dtype=dtype),
        },
        "t_embedder": {
            "fc1": dense_init(keys[1], 256, h, dtype=dtype),
            "fc2": dense_init(keys[2], h, h, dtype=dtype),
        },
        "y_embedder": _init_condition_embedder(keys[3], cfg.ydim, h, dtype),
        "txt_embedder": {
            "linear": dense_init(keys[4], cfg.text_dim, h, dtype=dtype),
            "null_embedding": embedding_init(keys[5], 1, h, dtype=dtype)["weight"],
        },
        "blocks": [],
        "output_layer": {
            "decoder": mlp_init(keys[6], h, h, final_dim, dtype=dtype),
            "ada_fc1": dense_init(keys[7], h, h, dtype=dtype),
            "ada_fc2": {
                "w": jnp.zeros((h, 2 * final_dim), dtype),
                "b": jnp.zeros((2 * final_dim,), dtype),
            },
        },
    }
    for d in range(cfg.depth):
        params["blocks"].append(_init_block(keys[16 + d], h, cfg, dtype))
    return params


def quantize_denoiser_params(params: Dict) -> Dict:
    """int8-quantize the denoiser's large gemms (experimental serving).

    Per-output-channel weight scales + dynamic per-token activation
    scales (ops/nn.py _dense_int8); logit rel-err ~1%, argmax agreement
    >99.5% (tests/test_graphdit.py). MEASURED SLOWER end-to-end on the
    v5e at the reference shape (bench --quant: 1056 vs 1313
    graph-steps/s): the quant/dequant passes cost more than the MXU
    saves — the chip only delivers ~1.25x int8-vs-bf16 in a matched
    scan harness, not the nominal 2x. Kept default-off for
    re-measurement on other TPU generations. Not differentiable."""
    from ...ops.nn import quantize_dense

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    out["x_embedder"] = dict(params["x_embedder"])
    out["x_embedder"]["linear"] = quantize_dense(params["x_embedder"]["linear"])
    out["blocks"] = []
    for blk in params["blocks"]:
        b = dict(blk)
        b["attn"] = dict(blk["attn"])
        b["attn"]["qkv"] = quantize_dense(blk["attn"]["qkv"])
        b["attn"]["proj"] = quantize_dense(blk["attn"]["proj"])
        b["mlp"] = {
            "fc1": quantize_dense(blk["mlp"]["fc1"]),
            "fc2": quantize_dense(blk["mlp"]["fc2"]),
        }
        out["blocks"].append(b)
    op = dict(params["output_layer"])
    op["decoder"] = {
        "fc1": quantize_dense(params["output_layer"]["decoder"]["fc1"]),
        "fc2": quantize_dense(params["output_layer"]["decoder"]["fc2"]),
    }
    out["output_layer"] = op
    return out


def _init_condition_embedder(key, ydim, h, dtype):
    ks = jax.random.split(key, 2 * ydim + 1)
    mlps = []
    for d in range(ydim):
        mlps.append({
            "fc1": dense_init(ks[2 * d], 1, h, dtype=dtype),
            "fc2": dense_init(ks[2 * d + 1], h, h, bias=False, dtype=dtype),
        })
    return {
        "mlps": mlps,
        "null_embedding": embedding_init(ks[-1], ydim, h, dtype=dtype)["weight"],
    }


def _init_block(key, h, cfg: GraphDiTConfig, dtype):
    ks = jax.random.split(key, 8)
    dh = h // cfg.num_heads
    return {
        "attn": {
            "qkv": dense_init(ks[0], h, 3 * h, bias=False, dtype=dtype),
            "q_norm": layer_norm_init(dh, affine=True, dtype=dtype),
            "k_norm": layer_norm_init(dh, affine=True, dtype=dtype),
            "proj": dense_init(ks[1], h, h, dtype=dtype),
        },
        "mlp": mlp_init(ks[2], h, int(h * cfg.mlp_ratio), h, dtype=dtype),
        # AdaLN first linear zero-init => gates start at 0 => identity blocks
        # (parity: transformer.py:82-84 _constant_init(adaLN[0], 0))
        "ada_fc1": {"w": jnp.zeros((h, h), dtype), "b": jnp.zeros((h,), dtype)},
        "ada_fc2": dense_init(ks[3], h, 6 * h, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _timestep_embedding(t: jnp.ndarray, dim: int = 256, max_period=10000.0):
    """Sinusoidal embedding of (possibly fractional) timesteps [B]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _embed_timestep(params, t, dtype):
    emb = _timestep_embedding(t.reshape(-1)).astype(dtype)
    return dense(params["fc2"], jax.nn.silu(dense(params["fc1"], emb)))


def _embed_properties(params, y, *, key, train: bool, unconditioned: bool,
                      drop_prob: float, dtype):
    """Per-property MLPs with NaN/CFG dropout to a learned null embedding
    (parity: conditions.py:60-98 ConditionEmbedder; the torch Softmax(dim=1)
    over hidden features is reproduced verbatim)."""
    bsz, ydim = y.shape
    total = jnp.zeros((bsz, params["null_embedding"].shape[1]), dtype)
    for d in range(ydim):
        label = y[:, d:d + 1].astype(dtype)
        drop = jnp.isnan(y[:, d])
        if unconditioned:
            drop = jnp.ones_like(drop)
        elif train and drop_prob > 0:
            key, sub = jax.random.split(key)
            drop = drop | (jax.random.uniform(sub, (bsz,)) < drop_prob)
        safe = jnp.where(jnp.isnan(label), 0.0, label)
        p = params["mlps"][d]
        h = jax.nn.softmax(dense(p["fc1"], safe).astype(jnp.float32), axis=1).astype(dtype)
        out = dense(p["fc2"], h)
        emb = jnp.where(drop[:, None], params["null_embedding"][d][None, :], out)
        if train:
            key, sub = jax.random.split(key)
            emb = emb + jax.random.normal(sub, emb.shape, dtype)
        total = total + emb
    return total


def _embed_text(params, txt, *, key, train: bool, unconditioned: bool,
                drop_prob: float, dtype):
    bsz = txt.shape[0]
    drop = jnp.isnan(jnp.sum(txt.astype(jnp.float32), axis=1))
    if unconditioned:
        drop = jnp.ones_like(drop)
    elif train and drop_prob > 0:
        key, sub = jax.random.split(key)
        drop = drop | (jax.random.uniform(sub, (bsz,)) < drop_prob)
    safe = jnp.where(jnp.isnan(txt), 0.0, txt).astype(dtype)
    out = dense(params["linear"], safe)
    return jnp.where(drop[:, None], params["null_embedding"][0][None, :], out)


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _block_apply(p, x, c, node_mask, num_heads, fused_attention=False):
    mods = softsign(dense(p["ada_fc2"], jax.nn.silu(dense(p["ada_fc1"], c))))
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mods, 6, axis=-1)

    b, n, h = x.shape
    dh = h // num_heads
    qkv_flat = dense(p["attn"]["qkv"], x)          # [B, N, 3H]
    if fused_attention:
        # Pallas path: qk-norm + masked MHA in one kernel, consuming the
        # raw qkv tensor (no [B,H,N,Dh] transposes materialize). Used at
        # sampling time only — profiling showed the jnp chain costs ~43%
        # of denoiser runtime for ~1% of FLOPs (VERDICT r1 item 7;
        # scripts/profile_denoiser.py).
        from ...ops.pallas.fused_attention import fused_block_attention
        attn_flat = fused_block_attention(
            qkv_flat, node_mask, p["attn"]["q_norm"], p["attn"]["k_norm"],
            num_heads)
    else:
        # training path: plain jnp so autodiff is free and XLA handles it
        qkv = qkv_flat.reshape(b, n, 3, num_heads, dh)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3)]
        q = layer_norm(q, p["attn"]["q_norm"])
        k = layer_norm(k, p["attn"]["k_norm"])
        attn = masked_attention(q, k, v, key_mask=node_mask)
        attn_flat = jnp.moveaxis(attn, 1, 2).reshape(b, n, h)
    attn_out = dense(p["attn"]["proj"], attn_flat)
    x = x + g_a[:, None, :] * _modulate(layer_norm(attn_out), sh_a, sc_a)

    mlp_out = mlp_apply(p["mlp"], x)
    x = x + g_m[:, None, :] * _modulate(layer_norm(mlp_out), sh_m, sc_m)
    return x


def apply_denoiser(
    params: Dict,
    cfg: GraphDiTConfig,
    X_in: jnp.ndarray,       # [B, N, Xdim] one-hot (float)
    E_in: jnp.ndarray,       # [B, N, N, Edim] one-hot (float)
    node_mask: jnp.ndarray,  # [B, N] bool
    y: jnp.ndarray,          # [B, ydim] float, NaN = unconditioned channel
    txt: jnp.ndarray,        # [B, text_dim]
    t: jnp.ndarray,          # [B] or [B,1] normalized timestep
    *,
    train: bool = False,
    unconditioned: bool = False,
    rng: Optional[jax.Array] = None,
):
    """Returns (X_logits [B,N,Xdim], E_logits [B,N,N,Edim]), masked."""
    emb_lin = params["x_embedder"]["linear"]
    dtype = (params["x_embedder"]["norm"]["scale"].dtype  # int8 serving
             if "w_q" in emb_lin else emb_lin["w"].dtype)
    b, n, dx = X_in.shape
    de = E_in.shape[-1]
    X_in = X_in.astype(dtype)
    E_in = E_in.astype(dtype)

    tokens = jnp.concatenate([X_in, E_in.reshape(b, n, n * de)], axis=-1)
    x = dense(params["x_embedder"]["linear"], tokens)
    x = layer_norm(x, params["x_embedder"]["norm"])

    if rng is None:
        rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    c = _embed_timestep(params["t_embedder"], t, dtype)
    c = c + _embed_properties(
        params["y_embedder"], y, key=k1, train=train,
        unconditioned=unconditioned, drop_prob=cfg.drop_condition, dtype=dtype)
    c = c + _embed_text(
        params["txt_embedder"], txt, key=k2, train=train,
        unconditioned=unconditioned, drop_prob=cfg.drop_condition, dtype=dtype)

    fused = (not train) and jax.devices()[0].platform == "tpu"
    for p in params["blocks"]:
        x = _block_apply(p, x, c, node_mask, cfg.num_heads,
                         fused_attention=fused)

    # output layer
    op = params["output_layer"]
    x_all = mlp_apply(op["decoder"], x)
    mods = dense(op["ada_fc2"], jax.nn.silu(dense(op["ada_fc1"], c)))
    shift, scale = jnp.split(mods, 2, axis=-1)
    x_all = _modulate(layer_norm(x_all), shift, scale)

    atom_out = X_in + x_all[:, :, :dx]
    bond_out = E_in + x_all[:, :, dx:].reshape(b, n, n, de)

    pair_mask = (node_mask[:, :, None] & node_mask[:, None, :])[..., None]
    eye = jnp.eye(n, dtype=bool)[None, :, :, None]
    bond_out = jnp.where(pair_mask & ~eye, bond_out, 0.0)
    bond_out = 0.5 * (bond_out + jnp.swapaxes(bond_out, 1, 2))
    atom_out = jnp.where(node_mask[:, :, None], atom_out, 0.0)
    return atom_out, bond_out
