"""Pallas kernel correctness vs jnp references (interpret mode on CPU;
the same kernels run compiled on TPU — benchmarked in bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamole_tpu.ops.attention import masked_attention
from llamole_tpu.ops.pallas.gin_aggregate import gin_aggregate
from llamole_tpu.ops.pallas.graph_attention import graph_attention


@pytest.mark.parametrize("shape", [(2, 4, 13, 24), (1, 2, 64, 64), (3, 8, 50, 32)])
def test_graph_attention_matches_reference(shape):
    b, h, n, dh = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    mask = jnp.asarray(rng.random((b, n)) < 0.7).at[:, 0].set(True)
    ref = masked_attention(q, k, v, mask)
    out = graph_attention(q, k, v, mask, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=2e-5, rtol=2e-5)


def test_gin_aggregate_matches_reference():
    rng = np.random.default_rng(1)
    B, N, H = 3, 11, 40
    x = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    edges = jnp.asarray(rng.integers(0, 5, (B, N, N)), jnp.int32)
    edges = jnp.triu(edges, 1)
    edges = edges + jnp.swapaxes(edges, 1, 2)
    adj = (edges > 0).astype(jnp.float32)
    table = jnp.asarray(rng.normal(size=(5, H)), jnp.float32)
    ref = gin_aggregate(x, edges, adj, table, use_pallas=False)
    out = gin_aggregate(x, edges, adj, table, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-4, rtol=1e-4)


def test_gin_backward_matches_reference():
    from llamole_tpu.ops.pallas.gin_aggregate import _gin_bwd_jnp, _gin_bwd_pallas
    rng = np.random.default_rng(2)
    B, N, H = 2, 9, 24
    x = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    edges = jnp.asarray(rng.integers(0, 5, (B, N, N)), jnp.int32)
    edges = jnp.triu(edges, 1)
    edges = edges + jnp.swapaxes(edges, 1, 2)
    adj = (edges > 0).astype(jnp.float32)
    table = jnp.asarray(rng.normal(size=(5, H)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, N, H)), jnp.float32)
    dx_ref, _, _, dt_ref = _gin_bwd_jnp((x, edges, adj, table), g)
    dx, dt = _gin_bwd_pallas(x, edges, adj, table, g, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(dt_ref),
                               atol=1e-4, rtol=1e-4)


def test_gin_aggregate_empty_graph():
    x = jnp.zeros((1, 4, 8))
    edges = jnp.zeros((1, 4, 4), jnp.int32)
    adj = jnp.zeros((1, 4, 4))
    table = jnp.ones((5, 8))
    out = gin_aggregate(x, edges, adj, table, use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
