"""Decompose GraphDiT denoiser step time on the TPU (forced-sync).

Measures, at the reference shape (depth 28, H 1024, B 128 = 2x64 CFG,
N 50): (a) full denoiser forward, (b) the bare matmul skeleton at the
same shapes (qkv+proj+mlp chains), (c) attention sub-chain alone,
(d) encoder train-step with Pallas vs jnp gin_aggregate fwd+bwd.
Decides whether a fused AdaLN block kernel has headroom (VERDICT item 7).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])[0]  # force
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from llamole_tpu.models.graphdit import GraphDiT, GraphDiTConfig
    from llamole_tpu.models.graphdit.config import build_data_info_from_smiles
    from llamole_tpu.models.graphdit.denoiser import apply_denoiser

    B, N, H, D = 128, 50, 1024, 28
    cfg = GraphDiTConfig(hidden_size=H, depth=D, num_heads=16,
                         diffusion_steps=10, text_dim=768)
    info = build_data_info_from_smiles(
        ["CCO", "c1ccccc1", "CC(=O)O", "CCN"], max_n_nodes=N)
    model = GraphDiT(cfg, info, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))

    X = jnp.zeros((B, N, cfg.Xdim), jnp.float32).at[:, :, 1].set(1.0)
    E = jnp.zeros((B, N, N, cfg.Edim), jnp.float32).at[:, :, :, 0].set(1.0)
    mask = jnp.ones((B, N), bool)
    y = jnp.full((B, cfg.ydim), jnp.nan)
    txt = jnp.zeros((B, cfg.text_dim))
    t = jnp.full((B,), 0.5)

    fwd = jax.jit(lambda p: apply_denoiser(p, cfg, X, E, mask, y, txt, t))
    t_full = timeit(fwd, params)
    flops = D * (2 * B * N * H * (3 * H + H + 8 * H))  # qkv+proj+mlp
    print(f"denoiser fwd: {t_full*1000:.2f} ms -> "
          f"{flops / t_full / 1e12:.1f} TFLOP/s ({flops/1e9:.0f} GFLOP)")

    # bare matmul skeleton at identical shapes
    T = B * N
    x = jnp.zeros((T, H), jnp.bfloat16)
    wq = jnp.zeros((H, 3 * H), jnp.bfloat16)
    wo = jnp.zeros((H, H), jnp.bfloat16)
    w1 = jnp.zeros((H, 4 * H), jnp.bfloat16)
    w2 = jnp.zeros((4 * H, H), jnp.bfloat16)

    @jax.jit
    def skeleton(x):
        for _ in range(D):
            qkv = x @ wq
            x = x + qkv[:, :H] @ wo
            x = x + jax.nn.gelu(x @ w1) @ w2
        return x

    t_skel = timeit(skeleton, x)
    print(f"matmul skeleton: {t_skel*1000:.2f} ms -> "
          f"{flops / t_skel / 1e12:.1f} TFLOP/s")
    print(f"non-matmul overhead: {(t_full - t_skel)*1000:.2f} ms "
          f"({100*(t_full-t_skel)/t_full:.0f}% of fwd)")

    # attention sub-chain alone (as the denoiser runs it)
    from llamole_tpu.ops.attention import masked_attention
    q = jnp.zeros((B, 16, N, 64), jnp.bfloat16)

    @jax.jit
    def attn_chain(q):
        out = q
        for _ in range(D):
            out = masked_attention(out, out, out, key_mask=mask)
        return out

    t_attn = timeit(attn_chain, q)
    print(f"attention chain (28x): {t_attn*1000:.2f} ms")

    # encoder train step: pallas vs jnp gin path
    from llamole_tpu.ops.pallas.gin_aggregate import (
        _gin_pallas_diffable, _gin_reference)

    Bg, Ng, Hg = 64, 50, 300
    xg = jax.random.normal(jax.random.PRNGKey(0), (Bg, Ng, Hg), jnp.float32)
    edges = jax.random.randint(jax.random.PRNGKey(1), (Bg, Ng, Ng), 0, 5)
    edges = jnp.triu(edges, 1) + jnp.swapaxes(jnp.triu(edges, 1), 1, 2)
    adj = (edges > 0).astype(jnp.float32)
    table = jax.random.normal(jax.random.PRNGKey(2), (5, Hg), jnp.float32)

    def loss_pallas(x, tb):
        return jnp.sum(_gin_pallas_diffable(x, edges, adj, tb) ** 2)

    def loss_jnp(x, tb):
        return jnp.sum(_gin_reference(x, edges, adj, tb) ** 2)

    g_pallas = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))
    g_jnp = jax.jit(jax.grad(loss_jnp, argnums=(0, 1)))
    tp = timeit(g_pallas, xg, table)
    tj = timeit(g_jnp, xg, table)
    print(f"gin fwd+bwd: pallas {tp*1000:.2f} ms vs jnp {tj*1000:.2f} ms "
          f"({tj/tp:.2f}x)")
    # numerics agreement on TPU
    dp = g_pallas(xg, table)
    dj = g_jnp(xg, table)
    for a, b, name in ((dp[0], dj[0], "dx"), (dp[1], dj[1], "dtable")):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        print(f"  {name} rel err {err:.2e}")


if __name__ == "__main__":
    main()
