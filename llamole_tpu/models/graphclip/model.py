"""GraphCLIP molecule encoder: GIN with virtual node + projection head,
L2-normalized graph embeddings.

Parity with the reference GraphCLIP/GNNEncoder
(graph_encoder/model.py:23-205): atom Embedding(118,H), per-layer
GINConv + affine LayerNorm + GELU (not on last layer) + residual,
virtual-node max-pool feedback MLP between layers, global add pool,
projection head (fc -> LN -> GELU -> fc), unit-norm output.
"""

import json
import os
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.gin import gin_conv_apply, gin_conv_init, masked_add_pool, masked_max_pool
from ...ops.nn import (
    dense,
    dense_init,
    embedding_init,
    layer_norm,
    layer_norm_init,
)


@dataclass
class GraphCLIPConfig:
    num_layer: int = 5
    hidden_size: int = 300
    dropout: float = 0.0


class GraphCLIP:
    def __init__(self, cfg: GraphCLIPConfig, dtype=jnp.float32):
        if cfg.num_layer < 2:
            raise ValueError("Number of GNN layers must be greater than 1.")
        self.cfg = cfg
        self.dtype = dtype
        self.hidden_size = cfg.hidden_size

    def init(self, key: jax.Array) -> Dict:
        cfg = self.cfg
        h = cfg.hidden_size
        keys = jax.random.split(key, 4 + 3 * cfg.num_layer)
        params: Dict = {
            "atom_encoder": embedding_init(keys[0], 118, h, dtype=self.dtype)["weight"],
            "virtualnode": jnp.zeros((h,), self.dtype),
            "convs": [],
            "norms": [],
            "vn_mlps": [],
            "projection": {
                "fc1": dense_init(keys[1], h, h, dtype=self.dtype),
                "norm": layer_norm_init(h, affine=True, dtype=self.dtype),
                "fc2": dense_init(keys[2], h, h, dtype=self.dtype),
            },
        }
        for layer in range(cfg.num_layer):
            params["convs"].append(gin_conv_init(keys[4 + 3 * layer], h, self.dtype))
            params["norms"].append(layer_norm_init(h, affine=True, dtype=self.dtype))
            if layer < cfg.num_layer - 1:
                k1, k2 = jax.random.split(keys[5 + 3 * layer])
                params["vn_mlps"].append({
                    "fc1": dense_init(k1, h, 4 * h, dtype=self.dtype),
                    "norm": layer_norm_init(4 * h, affine=True, dtype=self.dtype),
                    "fc2": dense_init(k2, 4 * h, h, dtype=self.dtype),
                })
        return params

    def encode(self, params, atom_codes, edge_classes, node_mask) -> jnp.ndarray:
        """[B,N] codes + [B,N,N] edge classes -> [B,H] graph features
        (pre-projection; graph_encoder/model.py:124-154 forward)."""
        cfg = self.cfg
        mask_f = node_mask.astype(self.dtype)
        pair = node_mask[:, :, None] & node_mask[:, None, :]
        adj = ((edge_classes > 0) & pair).astype(self.dtype)

        h = params["atom_encoder"][atom_codes] * mask_f[..., None]
        vn = jnp.broadcast_to(params["virtualnode"][None, :],
                              (h.shape[0], cfg.hidden_size))
        h_prev = h
        for layer in range(cfg.num_layer):
            h_in = h_prev + vn[:, None, :] * mask_f[..., None]
            h = gin_conv_apply(params["convs"][layer], h_in, edge_classes, adj)
            h = layer_norm(h, params["norms"][layer])
            if layer < cfg.num_layer - 1:
                h = jax.nn.gelu(h, approximate=False)
            h = h + h_in
            if layer < cfg.num_layer - 1:
                pool = masked_max_pool(h_in, node_mask)
                m = params["vn_mlps"][layer]
                vn_upd = dense(m["fc2"], jax.nn.gelu(
                    layer_norm(dense(m["fc1"], pool), m["norm"]), approximate=False))
                vn = vn + vn_upd
            h_prev = h
        return masked_add_pool(h_prev * mask_f[..., None], node_mask)

    def __call__(self, params, atom_codes, edge_classes, node_mask) -> jnp.ndarray:
        """L2-normalized molecule embeddings [B,H]
        (graph_encoder/model.py:37-41). Full-f32 matmuls: the encoder is
        tiny and fp32 output fidelity is a parity requirement."""
        with jax.default_matmul_precision("float32"):
            feats = self.encode(params, atom_codes, edge_classes, node_mask)
            p = params["projection"]
            x = dense(p["fc1"], feats)
            x = layer_norm(x, p["norm"])
            x = jax.nn.gelu(x, approximate=False)
            x = dense(p["fc2"], x)
        norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        return (x.astype(jnp.float32) / jnp.clip(norm, 1e-12, None)).astype(x.dtype)

    # -- persistence --------------------------------------------------------
    def save_pretrained(self, params: Dict, output_dir: str) -> None:
        from ...utils.serialization import save_pytree
        os.makedirs(output_dir, exist_ok=True)
        save_pytree(params, os.path.join(output_dir, "model.msgpack"))
        with open(os.path.join(output_dir, "model_config.json"), "w") as f:
            json.dump({
                "graph_num_layer": self.cfg.num_layer,
                "graph_hidden_size": self.cfg.hidden_size,
                "dropout": self.cfg.dropout,
            }, f, indent=2)

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.float32):
        from ...utils.serialization import load_pytree
        with open(os.path.join(model_dir, "model_config.json")) as f:
            raw = json.load(f)
        cfg = GraphCLIPConfig(
            num_layer=raw.get("graph_num_layer", 5),
            hidden_size=raw.get("graph_hidden_size", 300),
            dropout=raw.get("dropout", 0.0),
        )
        model = cls(cfg, dtype=dtype)
        params = load_pytree(os.path.join(model_dir, "model.msgpack"))
        return model, params
