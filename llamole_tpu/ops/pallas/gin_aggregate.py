"""Fused GIN message aggregation.

The jnp path in ops/gin.py materializes messages [B, N, N, H]
(gelu(x_j + bond_emb_ij) summed over adjacent j) — at production sizes
(B=32, N=64, H=300) that's a ~150 MB HBM round trip per layer. This
kernel keeps one graph's [N, N, H] working set in VMEM per program and
writes only the [N, H] aggregate.

Inputs:  x [B, N, H], bond [B, N, N, H] is NEVER formed — the kernel
gathers bond embeddings from the [5, H] table by edge class on the fly.
adj/edge_classes [B, N, N] (int32), out [B, N, H].
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err ~1.5e-7) —
    Mosaic has no erf/erfc primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865475))


def _gin_kernel(x_ref, edge_ref, adj_ref, table_ref, out_ref):
    # blocks: x [1, N, H], edge/adj [1, N, N], table [8, H], out [1, N, H]
    # molecular graphs are undirected: edge/adj are symmetric, so the
    # j-th column equals the j-th (contiguous) row — read rows only.
    table = table_ref[:]              # [8, H]
    n = x_ref.shape[1]
    h = x_ref.shape[2]

    def body(j, acc):
        # message from source node j to every destination i:
        #   adj[i, j] * gelu(x[j] + table[edges[i, j]])
        e_row = edge_ref[0, pl.ds(j, 1), :]      # [1, N] == e[:, j]ᵀ
        a_row = adj_ref[0, pl.ds(j, 1), :]       # [1, N]
        # bond embedding by exact VPU selects over the 5 edge classes —
        # an MXU one-hot matmul here would run bf16 passes and lose ~1e-2
        e_col = e_row.reshape(n, 1)
        bond = jnp.zeros((n, h), jnp.float32)
        for cls in range(5):
            bond = jnp.where(e_col == cls,
                             table[cls, :][None, :].astype(jnp.float32),
                             bond)                                        # [N,H]
        xj = x_ref[0, pl.ds(j, 1), :]            # [1, H]
        msg = _gelu_exact(xj.astype(jnp.float32) + bond)
        return acc + msg * a_row.reshape(n, 1).astype(jnp.float32)

    acc = jax.lax.fori_loop(0, n, body, jnp.zeros((n, h), jnp.float32))
    out_ref[0] = acc.astype(out_ref.dtype)


def _pad_to(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gin_aggregate_pallas(x, edge_classes, adj, table, interpret=False):
    b, n, h = x.shape
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    n_pad = _pad_to(n, sub)
    h_pad = _pad_to(h, 128)
    if n_pad != n or h_pad != h:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, h_pad - h)])
        edge_classes = jnp.pad(edge_classes, [(0, 0), (0, n_pad - n), (0, n_pad - n)])
        adj = jnp.pad(adj, [(0, 0), (0, n_pad - n), (0, n_pad - n)])
        table = jnp.pad(table, [(0, 0), (0, h_pad - h)])

    out = pl.pallas_call(
        _gin_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h_pad), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, h_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, h_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, edge_classes.astype(jnp.int32), adj.astype(x.dtype),
      jnp.pad(table, [(0, 3), (0, 0)]))
    return out[:, :n, :h]


def _dgelu_exact(x):
    """d/dx gelu_exact(x) = Φ(x) + x·φ(x)."""
    inv_sqrt2 = 0.7071067811865475
    phi = jnp.exp(-0.5 * x * x) * 0.3989422804014327
    return 0.5 * (1.0 + _erf(x * inv_sqrt2)) + x * phi


def _gin_bwd_kernel(x_ref, edge_ref, adj_ref, table_ref, g_ref,
                    dx_ref, dtable_ref):
    """Per-graph backward: dx [1,N,H] and per-graph dtable [8,H].

    Same row-access trick as forward (symmetric adj/edges)."""
    table = table_ref[:]
    n = x_ref.shape[1]
    h = x_ref.shape[2]

    dtable_ref[0] = jnp.zeros((8, h), dtable_ref.dtype)

    def body(j, _):
        e_row = edge_ref[0, pl.ds(j, 1), :]          # [1, N]
        a_row = adj_ref[0, pl.ds(j, 1), :]           # [1, N]
        e_col = e_row.reshape(n, 1)
        xj = x_ref[0, pl.ds(j, 1), :].astype(jnp.float32)   # [1, H]
        bond = jnp.zeros((n, h), jnp.float32)
        for cls in range(5):
            bond = jnp.where(e_col == cls,
                             table[cls, :][None, :].astype(jnp.float32), bond)
        pre = xj + bond                               # [N, H]
        w = (g_ref[0].astype(jnp.float32)
             * a_row.reshape(n, 1).astype(jnp.float32)
             * _dgelu_exact(pre))                     # [N, H]
        dx_ref[0, pl.ds(j, 1), :] = jnp.sum(w, axis=0,
                                            keepdims=True).astype(dx_ref.dtype)
        for cls in range(5):
            contrib = jnp.sum(jnp.where(e_col == cls, w, 0.0), axis=0)
            dtable_ref[0, cls, :] = (dtable_ref[0, cls, :]
                                     + contrib.astype(dtable_ref.dtype))
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gin_bwd_pallas(x, edge_classes, adj, table, g, interpret=False):
    b, n, h = x.shape
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    n_pad = _pad_to(n, sub)
    h_pad = _pad_to(h, 128)
    if n_pad != n or h_pad != h:
        x = jnp.pad(x, [(0, 0), (0, n_pad - n), (0, h_pad - h)])
        g = jnp.pad(g, [(0, 0), (0, n_pad - n), (0, h_pad - h)])
        edge_classes = jnp.pad(edge_classes,
                               [(0, 0), (0, n_pad - n), (0, n_pad - n)])
        adj = jnp.pad(adj, [(0, 0), (0, n_pad - n), (0, n_pad - n)])
        table = jnp.pad(table, [(0, 0), (0, h_pad - h)])

    dx, dtable_per = pl.pallas_call(
        _gin_bwd_kernel,
        out_shape=(jax.ShapeDtypeStruct((b, n_pad, h_pad), jnp.float32),
                   jax.ShapeDtypeStruct((b, 8, h_pad), jnp.float32)),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, h_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, h_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, n_pad, h_pad), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, h_pad), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(x, edge_classes.astype(jnp.int32), adj.astype(x.dtype),
      jnp.pad(table, [(0, 3), (0, 0)]), g)
    dx = dx[:, :n, :h]
    dtable = jnp.sum(dtable_per, axis=0)[:5, :h]
    return dx, dtable


def _gin_reference(x, edge_classes, adj, bond_table):
    bond = bond_table[edge_classes]  # [B, N, N, H]
    msg = jax.nn.gelu(x[:, None, :, :] + bond, approximate=False)
    return jnp.einsum("bijh,bij->bih", msg, adj.astype(x.dtype))


@jax.custom_vjp
def _gin_pallas_diffable(x, edge_classes, adj, bond_table):
    return _gin_aggregate_pallas(x, edge_classes, adj, bond_table)


def _gin_fwd(x, edge_classes, adj, bond_table):
    return (_gin_aggregate_pallas(x, edge_classes, adj, bond_table),
            (x, edge_classes, adj, bond_table))


def _gin_bwd_jnp(residuals, g):
    # jnp backward reference (gradients flow through x and the bond
    # table — the predictor's AdaLN gates mix trainable conditioning into
    # conv inputs, so this path IS differentiated during mmsft)
    x, edge_classes, adj, bond_table = residuals
    pre = x[:, None, :, :] + bond_table[edge_classes]        # [B,N,N,H]
    # d gelu(exact)
    inv_sqrt2 = 0.7071067811865475
    phi = jnp.exp(-0.5 * pre.astype(jnp.float32) ** 2) / jnp.sqrt(2 * jnp.pi)
    dgelu = (0.5 * (1.0 + jax.lax.erf(pre.astype(jnp.float32) * inv_sqrt2))
             + pre.astype(jnp.float32) * phi)
    w = (g[:, :, None, :].astype(jnp.float32)
         * adj[..., None].astype(jnp.float32) * dgelu)       # [B,N,N,H]
    dx = jnp.sum(w, axis=1).astype(x.dtype)                  # grad wrt x_j
    flat_w = w.reshape(-1, w.shape[-1])
    flat_e = edge_classes.reshape(-1)
    dtable = jax.ops.segment_sum(flat_w, flat_e,
                                 num_segments=bond_table.shape[0])
    return dx, None, None, dtable.astype(bond_table.dtype)


def _gin_bwd(residuals, g):
    x, edge_classes, adj, bond_table = residuals
    if jax.devices()[0].platform == "tpu":
        dx, dtable = _gin_bwd_pallas(x, edge_classes, adj, bond_table, g)
        return (dx.astype(x.dtype), None, None,
                dtable.astype(bond_table.dtype))
    return _gin_bwd_jnp(residuals, g)


_gin_pallas_diffable.defvjp(_gin_fwd, _gin_bwd)


def gin_aggregate(
    x: jnp.ndarray,             # [B, N, H]
    edge_classes: jnp.ndarray,  # [B, N, N] int
    adj: jnp.ndarray,           # [B, N, N] float 0/1
    bond_table: jnp.ndarray,    # [5, H]
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Σ_j adj[·,j] ⊙ gelu(x_j + bond(e_·j)) with Pallas/jnp dispatch."""
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if not use_pallas and not interpret:
        return _gin_reference(x, edge_classes, adj, bond_table)
    if interpret:
        return _gin_aggregate_pallas(x, edge_classes, adj, bond_table,
                                     interpret=True)
    return _gin_pallas_diffable(x, edge_classes, adj, bond_table)
