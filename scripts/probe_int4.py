"""Measure effective weight-read bandwidth for bf16/int8/int4 matmul chains.

Decode at 8B is weight-HBM-bound (NOTES_ROUND3.md: 91% of the 8.56 GB /
819 GB/s floor with int8). If int4 weights halve HBM reads, decode tok/s
nearly doubles. This probe answers the only question that matters before
building a quantization_bit=4 path: does `x @ w_i4.astype(bf16)` (or a
packed-nibble variant) actually read 0.5 bytes/param on this axon stack,
or does XLA store/read int4 unpacked (1 byte) — in which case int4 is a
no-op vs int8 and the path is not worth shipping.

Timing: forced d2h sync (block_until_ready does not synchronize over the
axon tunnel); per-variant rate from the DIFFERENCE of two repeat counts
so dispatch/launch overhead cancels.

Usage: python scripts/probe_int4.py [--dim 8192] [--k 16] [--batch 8]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def _chain(x, ws, deq):
    def body(x, w):
        return (x @ deq(w)).astype(x.dtype), None
    x, _ = jax.lax.scan(body, x, ws)
    return x


@partial(jax.jit, static_argnames=("reps", "mode"))
def run(x, ws, reps: int, mode: str):
    if mode == "bf16":
        deq = lambda w: w
    elif mode in ("int8", "int4"):
        deq = lambda w: w.astype(jnp.bfloat16)
    elif mode in ("int4g", "w8a8"):
        # these modes use their own chain below; deq is unused
        def deq(w):
            return w
    elif mode == "packed":
        # two nibbles per int8 byte: w [in//2, out] int8 -> [in, out] bf16
        def deq(w):
            lo = jnp.left_shift(w, 4)
            lo = jnp.right_shift(lo, 4)          # sign-extended low nibble
            hi = jnp.right_shift(w, 4)           # arithmetic shift: high nibble
            return jnp.stack([lo, hi], axis=1).reshape(
                w.shape[0] * 2, w.shape[1]).astype(jnp.bfloat16)
    else:
        raise ValueError(mode)

    if mode == "w8a8":
        # native int8 MXU: quantize x per-row once per step, s8xs8->s32,
        # scale after — the weight operand streams straight from HBM to
        # the MXU with NO VPU convert (the convert tax is what caps the
        # int8-weight bf16 path at ~516 Gparam/s vs 722 GB/s raw)
        def body(x, w):
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            xs = jnp.maximum(amax, 1e-6) / 127.0
            x8 = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
            y32 = jax.lax.dot_general(
                x8, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (y32.astype(jnp.float32) * xs).astype(x.dtype), None
        def chain(x):
            x, _ = jax.lax.scan(body, x, ws)
            return x
        def outer(x, _):
            return chain(x), None
        x, _ = jax.lax.scan(outer, x, None, length=reps)
        return x

    if mode == "int4g":
        wq, scale = ws  # wq [k, G, gs, out] int4, scale [k, G, out] f32
        def body(x, w_s):
            w, s = w_s
            g, gs, out = w.shape
            xg = x.reshape(x.shape[0], g, gs).transpose(1, 0, 2)  # [G,B,gs]
            yg = jax.lax.dot_general(
                xg, w.astype(x.dtype),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))))  # [G,B,out]
            y = jnp.sum(yg * s.astype(x.dtype)[:, None, :], axis=0)
            return y.astype(x.dtype), None
        def chain(x):
            x, _ = jax.lax.scan(body, x, (wq, scale))
            return x
        def outer(x, _):
            return chain(x), None
        x, _ = jax.lax.scan(outer, x, None, length=reps)
        return x

    def outer(x, _):
        return _chain(x, ws, deq), None
    x, _ = jax.lax.scan(outer, x, None, length=reps)
    return x


def timed(x, ws, mode, reps_lo=4, reps_hi=12):
    out = run(x, ws, reps_lo, mode); np.asarray(out)   # compile lo
    out = run(x, ws, reps_hi, mode); np.asarray(out)   # compile hi
    t = {}
    for reps in (reps_lo, reps_hi):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x, ws, reps, mode)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        t[reps] = best
    dt = (t[reps_hi] - t[reps_lo]) / (reps_hi - reps_lo)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=8192)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    d, k, b = args.dim, args.k, args.batch

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, d), jnp.bfloat16)
    params_per_chain = k * d * d

    w8 = jax.random.randint(key, (k, d, d), -127, 128, jnp.int8)
    variants = {
        "bf16": (w8.astype(jnp.bfloat16), 2.0),
        "int8": (w8, 1.0),
        "int4": (jax.random.randint(key, (k, d, d), -8, 8, jnp.int8
                                    ).astype(jnp.int4), 0.5),
        "packed": (jax.random.randint(key, (k, d // 2, d), -127, 128,
                                      jnp.int8), 0.5),
        "int4g": ((jax.random.randint(key, (k, d // 128, 128, d), -8, 8,
                                      jnp.int8).astype(jnp.int4),
                   jnp.ones((k, d // 128, d), jnp.float32)), 0.5),
        "w8a8": (w8, 1.0),
    }
    print(f"chain: {k} x [{b},{d}]@[{d},{d}], params/chain = "
          f"{params_per_chain/1e9:.2f} G")
    for mode, (ws, bytes_per) in variants.items():
        try:
            dt = timed(x, ws, mode)
        except Exception as e:  # int4 may be unsupported on some stacks
            print(f"{mode:7s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        gb = params_per_chain * bytes_per / 1e9
        print(f"{mode:7s} {dt*1e3:8.2f} ms/chain  nominal {gb:6.2f} GB  "
              f"-> {gb/dt:7.1f} GB/s effective "
              f"({params_per_chain/dt/1e9:6.1f} Gparam/s)")


if __name__ == "__main__":
    main()
