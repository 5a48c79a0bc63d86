"""Prove the 8B-scale LLM decode path on the TPU (VERDICT round-1 item 2).

Three stages:
  1. numerics: int8 forward on TPU(bf16) vs CPU(fp32) on a sliced config
     — same quantized weights, logit/top-k agreement (the "logit
     checksum" gate against garbage output).
  2. load an 8B-shape (llama3.1) int8 random tree directly on the chip
     (never materializes the 16 GB bf16 tree — init_params_quantized).
  3. jitted prefill + decode with FORCED device->host sync (np.asarray;
     block_until_ready does not synchronize over the axon tunnel) at two
     scan lengths, so decode tok/s comes from the difference and cannot
     be faked by dispatch-only timing. A bandwidth plausibility bound
     (model bytes / ~819 GB/s v5e HBM) flags physically impossible
     numbers — the round-1 failure mode.

Reference envelope: single V100/A6000 inference (README.md:52).

Usage: python scripts/prove_8b_decode.py [--batch 1] [--prompt 512]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def checksum_sliced() -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llamole_tpu.models.gllm import LLM, LLMConfig
    from llamole_tpu.models.gllm.quantize import init_params_quantized

    cfg = LLMConfig(vocab_size=4096, hidden_size=512, intermediate_size=1408,
                    num_layers=4, num_heads=8, num_kv_heads=4,
                    rope_scaling="llama3")
    cpu = jax.devices("cpu")[0]
    key = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        params = init_params_quantized(key, cfg, dtype=jnp.float32)
        m32 = LLM(cfg, dtype=jnp.float32)
        ids = (jnp.arange(48)[None, :] * 97) % cfg.vocab_size
        logits_cpu, _, _ = m32(params, input_ids=ids)
        probs_cpu = np.asarray(jax.nn.softmax(logits_cpu[0, -1]))

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        return {"skipped": "no accelerator"}

    # same int8 weights; float leaves to bf16 (the serving dtype)
    params_dev = jax.tree.map(
        lambda x: jax.device_put(
            x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, dev),
        params)
    m16 = LLM(cfg, dtype=jnp.bfloat16)
    logits_tpu, _, _ = m16(params_dev, input_ids=jax.device_put(ids, dev))
    probs_tpu = np.asarray(jax.nn.softmax(
        logits_tpu[0, -1].astype(jnp.float32)))

    top_cpu = np.argsort(probs_cpu)[::-1][:8]
    top_tpu = np.argsort(probs_tpu)[::-1][:8]
    max_diff = float(np.abs(probs_cpu - probs_tpu).max())
    # random weights give near-tied top candidates, so top-1 identity is
    # not the gate; distribution agreement is
    return {
        "top1_match": bool(top_cpu[0] == top_tpu[0]),
        "top8_overlap": int(len(set(top_cpu) & set(top_tpu))),
        "max_prob_diff": max_diff,
        "pass": bool(max_diff < 1e-3 and
                     len(set(top_cpu) & set(top_tpu)) >= 6),
    }


def bench_8b(batch: int, prompt_len: int, kv_int8: bool = False,
             spec: int = 0, spec_probe: int = 8, bits: int = 8,
             w8a8: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llamole_tpu.models.gllm import LLM, LLMConfig
    from llamole_tpu.models.gllm.quantize import init_params_quantized, quantized_bytes

    cfg = LLMConfig.llama3_8b()
    if kv_int8:
        cfg.kv_cache_dtype = "int8"
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    t0 = time.perf_counter()
    params = init_params_quantized(jax.random.PRNGKey(7), cfg, jnp.bfloat16,
                                   bits=bits, act_int8=w8a8)
    jax.tree.map(lambda x: x.block_until_ready(), params)
    gb = quantized_bytes(params) / 1e9
    if bits == 4:
        # quantized_bytes counts int4 at itemsize 1 (jax reports 1 byte);
        # HBM stores int4 packed — halve the projection bytes for the
        # bandwidth floor (embeds/norms/scales stay full size)
        proj = sum(x.size for x in jax.tree.leaves(params)
                   if hasattr(x, "dtype") and x.dtype == jnp.int4)
        gb -= proj * 0.5 / 1e9
    print(f"8B int{bits} params materialized on-chip: {gb:.2f} GB "
          f"({time.perf_counter() - t0:.1f} s)", flush=True)

    m = LLM(cfg, dtype=jnp.bfloat16)
    ids = np.random.default_rng(0).integers(
        100, cfg.vocab_size - 100, size=(batch, prompt_len))
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones_like(ids)

    def timed_generate(T: int, reps: int = 2) -> float:
        """Median wall time of generate() with forced d2h sync."""
        times = []
        for r in range(reps + 1):  # first = compile
            t0 = time.perf_counter()
            # spec_tokens pinned explicitly: greedy now defaults to
            # auto-on drafting, but this is a bandwidth proof — measure
            # the plain scan loop unless --spec asks for the draft path
            toks, done = m.generate(
                params, jax.random.PRNGKey(r), ids, mask,
                max_new_tokens=T, do_sample=False, pad_id=0,
                spec_tokens=spec, spec_probe=spec_probe)
            np.asarray(toks)  # force real completion over the tunnel
            dt = time.perf_counter() - t0
            times.append(dt)
            print(f"  T={T} rep{r}{' (compile)' if r == 0 else ''}: "
                  f"{dt:.3f} s", flush=True)
        return min(times[1:])

    T1, T2 = 16, 80
    t_a = timed_generate(T1)
    t_b = timed_generate(T2)
    decode_s_per_tok = (t_b - t_a) / (T2 - T1)
    decode_tok_s = batch / decode_s_per_tok

    # separate prefill timing (jitted forward, no cache). The no-cache
    # attention materializes [B,H,S,S]; at very long batchxprompt that
    # OOMs even though cached generate() fits — skip gracefully there.
    try:
        fwd = jax.jit(lambda p, i, a: m(p, input_ids=i, attention_mask=a,
                                        last_logits_only=True)[0])
        fwd(params, ids, mask)  # compile
        t0 = time.perf_counter()
        out = fwd(params, ids, mask)
        np.asarray(out[:, -1, :8])
        t_prefill = time.perf_counter() - t0
    except Exception as e:  # HBM OOM at extreme shapes
        print(f"  prefill-only probe skipped: {str(e)[:120]}", flush=True)
        t_prefill = float("nan")

    # plausibility: decode is HBM-bound; a step cannot beat model-bytes/BW
    hbm_gb_s = 819.0  # v5e spec
    floor_s_per_tok = gb / hbm_gb_s
    plausible = decode_s_per_tok > 0.5 * floor_s_per_tok
    return {
        "model_gb": round(gb, 2),
        "batch": batch,
        "prompt_len": prompt_len,
        "prefill_s": round(t_prefill, 4),
        "prefill_tok_s": round(batch * prompt_len / t_prefill, 1)
        if t_prefill == t_prefill else None,
        "decode_s_per_tok": round(decode_s_per_tok, 5),
        "decode_tok_s": round(decode_tok_s, 2),
        "bandwidth_floor_s_per_tok": round(floor_s_per_tok, 5),
        "physically_plausible": bool(plausible),
        "kv_cache": cfg.kv_cache_dtype,
        "spec_tokens": spec,
        "weight_bits": bits,
        "scheme": "w8a8" if w8a8 else "weight_only",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--skip-checksum", action="store_true")
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--spec", type=int, default=0,
                    help="speculative drafts/step (guard active); 0 = scan")
    ap.add_argument("--spec-probe", type=int, default=8)
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8),
                    help="weight-only quantization width")
    ap.add_argument("--w8a8", action="store_true",
                    help="quantize activations too (native int8 MXU)")
    args = ap.parse_args()

    from llamole_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    result = {}
    if not args.skip_checksum:
        print("=== sliced-config logit checksum (TPU bf16 vs CPU fp32) ===",
              flush=True)
        result["checksum"] = checksum_sliced()
        print(json.dumps(result["checksum"]), flush=True)

    print(f"=== 8B int{args.bits} prefill/decode ===", flush=True)
    result["bench"] = bench_8b(args.batch, args.prompt, args.kv_int8,
                           spec=args.spec, spec_probe=args.spec_probe,
                           bits=args.bits, w8a8=args.w8a8)
    print(json.dumps(result["bench"], indent=2))


if __name__ == "__main__":
    main()
