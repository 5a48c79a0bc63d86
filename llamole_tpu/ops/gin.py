"""Dense GIN message passing for padded graph batches.

The reference's GINConv (graph_encoder/model.py:156-176,
graph_predictor/model.py:394-423) runs PyG sparse scatter:
  msg_i = Σ_{j∈N(i)} gelu(x_j + bond_emb(e_ij));  out = MLP((1+ε)x + msg)

TPU-first we hold graphs as dense [B, N, N] edge-class tensors and do the
aggregation as a masked einsum — no scatters, static shapes, MXU-friendly.
Padded nodes and class-0 (no-edge) pairs contribute nothing.
"""

from typing import Dict

import jax
import jax.numpy as jnp

from .nn import dense, dense_init, embedding_init, layer_norm, layer_norm_init


def gin_conv_init(key, hidden: int, dtype=jnp.float32) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "bond_embedding": embedding_init(k1, 5, hidden, dtype=dtype)["weight"],
        "eps": jnp.zeros((), dtype),
        "mlp": {
            "fc1": dense_init(k2, hidden, 4 * hidden, dtype=dtype),
            "norm": layer_norm_init(4 * hidden, affine=True, dtype=dtype),
            "fc2": dense_init(k3, 4 * hidden, hidden, dtype=dtype),
        },
    }


def gin_conv_apply(
    params: Dict,
    x: jnp.ndarray,            # [B, N, H]
    edge_classes: jnp.ndarray, # [B, N, N] int (0 = no edge)
    adj: jnp.ndarray,          # [B, N, N] float adjacency (0/1)
) -> jnp.ndarray:
    from .pallas.gin_aggregate import gin_aggregate
    agg = gin_aggregate(x, edge_classes, adj, params["bond_embedding"])
    h = (1.0 + params["eps"]) * x + agg
    m = params["mlp"]
    # graph modules are tiny; full f32 MXU passes keep fp32 output
    # fidelity vs the reference (BASELINE.md parity row) at ~zero cost
    with jax.default_matmul_precision("float32"):
        h = dense(m["fc1"], h)
        h = layer_norm(h, m["norm"])
        h = jax.nn.gelu(h, approximate=False)
        return dense(m["fc2"], h)


def masked_add_pool(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """Σ over valid nodes -> [B, H] (PyG global_add_pool parity)."""
    return jnp.einsum("bnh,bn->bh", x, node_mask.astype(x.dtype))


def masked_max_pool(x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """max over valid nodes -> [B, H] (PyG global_max_pool parity)."""
    neg = jnp.asarray(-1e30, x.dtype)
    masked = jnp.where(node_mask[..., None], x, neg)
    return jnp.max(masked, axis=1)
