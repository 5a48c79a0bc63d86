"""Ring attention (context parallelism) on the 8-virtual-device mesh.

The reference has no sequence/context parallelism (SURVEY §2.2);
ring_attention is the TPU-native long-context extension SURVEY §5
sketches. Correctness bar: matches single-device causal attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from llamole_tpu.ops.ring_attention import ring_attention


def _reference_causal(q, k, v, mask):
    b, s, h, d = q.shape
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(d)
    causal = jnp.tril(jnp.ones((s, s), bool))
    m = causal[None, None] & (mask[:, None, None, :] > 0)
    logits = jnp.where(m, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v.dtype), v)
    return jnp.moveaxis(out, 1, 2)


def _mesh(n=8, axis="sp"):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), axis_names=(axis,))


@pytest.mark.parametrize("b,s,h,d", [(2, 64, 4, 16), (1, 128, 2, 8)])
def test_ring_matches_full_attention(b, s, h, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    mesh = _mesh()
    out = ring_attention(q, k, v, mask, mesh)
    ref = _reference_causal(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_respects_padding():
    rng = np.random.default_rng(1)
    b, s, h, d = 2, 64, 2, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32).at[:, -24:].set(0)
    mesh = _mesh()
    out = ring_attention(q, k, v, mask, mesh)
    ref = _reference_causal(q, k, v, mask)
    valid = s - 24
    np.testing.assert_allclose(np.asarray(out[:, :valid]),
                               np.asarray(ref[:, :valid]),
                               atol=2e-5, rtol=2e-5)
    # poisoning padded k/v must not change valid outputs
    k2 = k.at[:, -24:].set(1e3)
    v2 = v.at[:, -24:].set(1e3)
    out2 = ring_attention(q, k2, v2, mask, mesh)
    np.testing.assert_allclose(np.asarray(out[:, :valid]),
                               np.asarray(out2[:, :valid]),
                               atol=2e-5, rtol=2e-5)


def test_ring_is_differentiable():
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 32, 2, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    mesh = _mesh()

    def loss(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mask, mesh) ** 2)

    def ref_loss(q, k, v):
        return jnp.sum(_reference_causal(q, k, v, mask) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-4, rtol=5e-4)


def test_mesh_with_sp_axis():
    """create_mesh grows an sp axis and ring attention runs on it
    alongside dp."""
    from llamole_tpu.parallel import create_mesh

    mesh = create_mesh(dp=2, tp=1, sp=4)
    assert dict(mesh.shape) == {"dp": 2, "sp": 4, "tp": 1}
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 32, 2, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    out = ring_attention(q, k, v, mask, mesh, axis="sp")
    ref = _reference_causal(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
