"""int8 matmul microbenchmarks vs XLA bf16 (PERF.md round 4).

Run on a real chip: python benchmarks/quant_kernel.py

Timing methodology (round-4 revision, supersedes the round-3 note): over
the remote-TPU tunnel each jit CALL costs ~20-30 ms of dispatch+fetch RPC.
Round 3 amortized that over 200 in-jit iterations — a constant
~120 us/iter added to every variant, squashing all ratios toward 1 (that
table's "W8A8 1.02-1.06x" was the artifact). The fix: time the SAME jitted
``fori_loop`` at two iteration counts; the slope cancels the per-call
constant exactly. The loop chain is ``xx + sum(y) * 0`` — float, so XLA
cannot fold it (for the pre-quantized int8 variant the chain XORs the
sign bits of the row sums instead: integer ``* 0`` IS foldable and DCE'd
the whole matmul in an early version).

Variants per shape:
  bf16      — XLA bf16 matmul (the baseline the model runs)
  i8_static — int8 x int8 -> int32 dot with both operands pre-quantized:
              the pure int8-MXU rate through XLA
  w8a8      — ops.quant.int8_dynamic_matmul: per-row activation quant
              in-loop (what serving pays)
  w8a8_train— ops.quant.int8_training_matmul forward (weights quantized
              fresh per call, as in training)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from mindaudio_tpu.ops.quant import (int8_dynamic_matmul,
                                     int8_training_matmul, quantize_int8)

N_LO, N_HI, REPS = 400, 2400, 5


def slope_us(make_loop, *args):
    f1, f2 = make_loop(N_LO), make_loop(N_HI)
    float(f1(*args)); float(f2(*args))
    best1 = best2 = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter(); float(f1(*args))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2(*args))
        best2 = min(best2, time.perf_counter() - t0)
    return (best2 - best1) / (N_HI - N_LO) * 1e6


def chain(y, xx):
    return xx + (y.sum(axis=1, keepdims=True) * 0).astype(xx.dtype)[:, :1]


def main():
    rng = np.random.default_rng(0)
    results = {}
    for name, (m, k, n) in {
        "ffn_up_T512":  (512, 256, 2048),    # streaming/serving FFN
        "ffn_up_T4096": (4096, 256, 2048),   # batch-32 training FFN
        "ffn_down":     (4096, 2048, 256),   # FFN down-projection
        "vocab_proj":   (4096, 256, 4352),   # CTC projection (padded)
    }.items():
        x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
        wb = jnp.asarray(w, jnp.bfloat16)
        wf = jnp.asarray(w)
        vq, s = quantize_int8(w)
        vq_d, s_d = jnp.asarray(vq), jnp.asarray(s)
        xq0 = jnp.asarray(np.clip(
            np.round(np.asarray(x0, np.float32) / 0.03), -127, 127
        ).astype(np.int8))

        # correctness
        got = np.asarray(int8_dynamic_matmul(x0, vq_d, s_d), np.float32)
        ref = np.asarray(x0, np.float32) @ w
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)

        def mk_bf16(iters):
            def loop(x, wb):
                def body(i, xx):
                    y = jnp.dot(xx, wb,
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                    return chain(y, xx)
                return jax.lax.fori_loop(0, iters, body, x
                                         ).astype(jnp.float32).sum()
            return jax.jit(loop)

        def mk_i8_static(iters):
            def loop(xq, wq):
                def body(i, xx):
                    y = jax.lax.dot_general(
                        xx, wq, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    s = (y.sum(axis=1, keepdims=True) >> 31).astype(jnp.int8)
                    return xx ^ s[:, :1]
                return jax.lax.fori_loop(0, iters, body, xq
                                         ).astype(jnp.float32).sum()
            return jax.jit(loop)

        def mk_w8a8(iters):
            def loop(x, wq, sc):
                def body(i, xx):
                    return chain(int8_dynamic_matmul(xx, wq, sc), xx)
                return jax.lax.fori_loop(0, iters, body, x
                                         ).astype(jnp.float32).sum()
            return jax.jit(loop)

        def mk_w8a8_train(iters):
            def loop(x, wf):
                def body(i, xx):
                    return chain(int8_training_matmul(xx, wf), xx)
                return jax.lax.fori_loop(0, iters, body, x
                                         ).astype(jnp.float32).sum()
            return jax.jit(loop)

        us = {
            "bf16": slope_us(mk_bf16, x0, wb),
            "i8_static": slope_us(mk_i8_static, xq0, vq_d),
            "w8a8": slope_us(mk_w8a8, x0, vq_d, s_d),
            "w8a8_train": slope_us(mk_w8a8_train, x0, wf),
        }
        gflop = 2 * m * k * n / 1e9
        results[name] = {
            **{v: round(t, 1) for v, t in us.items()},
            "bf16_tflops": round(gflop / us["bf16"] * 1e3, 1),
            "i8_static_tops": round(gflop / us["i8_static"] * 1e3, 1),
            "r_static": round(us["bf16"] / us["i8_static"], 2),
            "r_w8a8": round(us["bf16"] / us["w8a8"], 2),
            "r_w8a8_train": round(us["bf16"] / us["w8a8_train"], 2),
            "max_rel_err": round(float(rel), 4),
        }
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
