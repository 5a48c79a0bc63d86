"""Prove 8B-scale LoRA training on ONE v5e chip (16 GB HBM).

The reference recommends an 80 GB A100 for SFT (README.md:138). Here the
frozen 8B body lives int8 on-chip (8.56 GB), LoRA adapters + Adam
moments are bf16/f32, and the jitted train step (loss + grads through
the int8 matmuls + optimizer update on the adapters) runs with forced
d2h sync and scan-length-difference timing like prove_8b_decode.py.

Usage: python scripts/prove_8b_train.py [--batch 2] [--seq 1024] [--remat]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    from llamole_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from llamole_tpu.models.gllm import LLMConfig
    from llamole_tpu.models.gllm.lora import init_lora
    from llamole_tpu.models.gllm.model import forward, lm_loss
    from llamole_tpu.models.gllm.quantize import init_params_quantized, quantized_bytes
    from llamole_tpu.models.gllm.stacked import stack_layers
    from llamole_tpu.utils.constants import IGNORE_INDEX

    cfg = LLMConfig.llama3_8b()
    cfg.remat = args.remat
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    t0 = time.perf_counter()
    params = init_params_quantized(jax.random.PRNGKey(7), cfg, jnp.bfloat16)
    # forced d2h — block_until_ready does not sync over the axon tunnel
    np.asarray(jax.tree.leaves(params)[0]).ravel()[:1]
    print(f"8B int8 frozen body: {quantized_bytes(params)/1e9:.2f} GB "
          f"({time.perf_counter()-t0:.1f} s)", flush=True)

    lora = stack_layers(init_lora(jax.random.PRNGKey(1), cfg,
                                  rank=args.rank, dtype=jnp.bfloat16))
    n_lora = sum(x.size for x in jax.tree.leaves(lora))
    print(f"LoRA rank {args.rank}: {n_lora/1e6:.1f}M trainable params",
          flush=True)

    tx = optax.adamw(1e-4)
    opt_state = tx.init(lora)

    B, S = args.batch, args.seq
    gen = np.random.default_rng(0)
    ids = jnp.asarray(gen.integers(100, cfg.vocab_size - 100, (B, S)),
                      jnp.int32)
    labels = jnp.where(jnp.arange(S)[None, :] < S // 4, IGNORE_INDEX, ids)

    def loss_fn(lr, frozen, batch_ids, batch_labels):
        logits, _, _ = forward(frozen, cfg, input_ids=batch_ids, lora=lr,
                               train=True)
        return lm_loss(logits, batch_labels, IGNORE_INDEX)

    # frozen params MUST be jit arguments — a closure would bake 8.56 GB
    # of constants into the lowered program (and into the tunnel compile)
    @jax.jit
    def train_step(lr, opt, frozen, batch_ids, batch_labels):
        loss, grads = jax.value_and_grad(loss_fn)(lr, frozen, batch_ids,
                                                  batch_labels)
        updates, opt = tx.update(grads, opt, lr)
        return optax.apply_updates(lr, updates), opt, loss

    def timed(n_steps, reps=2):
        times = []
        for r in range(reps + 1):
            lr, opt = lora, opt_state
            t0 = time.perf_counter()
            for _ in range(n_steps):
                lr, opt, loss = train_step(lr, opt, params, ids, labels)
            np.asarray(loss)  # forced device->host sync
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"  {n_steps} steps rep{r}"
                  f"{' (compile)' if r == 0 else ''}: {dt:.3f} s", flush=True)
        return min(times[1:])

    t1 = timed(1)
    t3 = timed(3)
    step_s = (t3 - t1) / 2
    tok_s = B * S / step_s
    out = {
        "batch": B, "seq": S, "lora_rank": args.rank, "remat": args.remat,
        "step_s": round(step_s, 4),
        "tokens_per_s": round(tok_s, 1),
        "loss_finite": bool(np.isfinite(float(np.asarray(
            loss_fn(lora, params, ids, labels))))),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
