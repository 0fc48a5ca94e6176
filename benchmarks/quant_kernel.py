"""int8 dequant-in-VMEM matmul vs XLA bf16 (PERF.md).

Run on a real chip: python benchmarks/quant_kernel.py

Timing methodology (round-3 revision): over the remote-TPU tunnel,
``block_until_ready`` on repeated identical calls measures DISPATCH, not
device execution — unchained 50-call loops produced physically impossible
numbers (34 GFLOP matmuls "in 16 us" > 5x the chip's peak). The only
trustworthy clock is a data-dependent in-jit ``fori_loop`` whose final
scalar is FETCHED: one dispatch, every iteration forced by the fetch, work
sized far above tunnel latency. Both variants share an identical
back-projection so its cost cancels; each writes its matmul result at
bf16 width (the Pallas kernel narrows in its store epilogue exactly like
XLA's fused cast).
"""
import sys, time, json
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from mindaudio_tpu.ops.quant import (int8_dynamic_matmul, int8_matmul,
                                     quantize_int8)

ITERS = 200
rng = np.random.default_rng(0)
results = {}
for name, (m, k, n) in {
    "ffn_up_T512":  (512, 256, 2048),    # streaming/serving FFN
    "ffn_up_T4096": (4096, 256, 2048),   # batch-16 full-utterance FFN
    "vocab_proj":   (4096, 256, 4233),   # CTC projection
}.items():
    x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    vq, s = quantize_int8(w)
    vq_d, s_d = jnp.asarray(vq), jnp.asarray(s)
    wb = jnp.asarray(w, jnp.bfloat16)
    # identical closing projection for both variants (cost cancels)
    wback = jnp.asarray(rng.standard_normal((n, k)) * 0.01, jnp.bfloat16)

    # correctness first (weights as ARGUMENTS — closing over device arrays
    # embeds them as HLO literals, pathological on a remote backend)
    f_q = jax.jit(lambda x, v, sc: int8_matmul(x, v, sc))
    f_b = jax.jit(lambda x, w: x @ w)
    a = np.asarray(f_q(x0, vq_d, s_d), np.float32)
    b = np.asarray(f_b(x0, wb), np.float32)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)

    def loop(matmul):
        def run(x, wback):
            def body(i, xx):
                y = matmul(xx)                      # the op under test
                return jnp.tanh(y @ wback)          # full data dependency
            return jax.lax.fori_loop(0, ITERS, body, x).sum()
        return run

    us = {}
    for variant, fn in (
        ("bf16", jax.jit(lambda x, wb_, wback: loop(lambda xx: xx @ wb_)(x, wback))),
        ("int8", jax.jit(lambda x, v, sc, wback: loop(
            lambda xx: int8_matmul(xx, v, sc))(x, wback))),
        # W8A8: activations quantized per-row in-loop; int8 MXU runs at 2x
        # the bf16 rate on v5e, the only int8 path that can BEAT bf16 at
        # compute-bound shapes
        ("w8a8", jax.jit(lambda x, v, sc, wback: loop(
            lambda xx: int8_dynamic_matmul(xx, v, sc))(x, wback))),
    ):
        args = (x0, wb, wback) if variant == "bf16" else (x0, vq_d, s_d, wback)
        float(fn(*args))  # compile + first fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))  # scalar fetch forces the whole chain
            best = min(best, time.perf_counter() - t0)
        us[variant] = best / ITERS * 1e6
    results[name] = {
        "int8_us": round(us["int8"], 1), "bf16_us": round(us["bf16"], 1),
        "w8a8_us": round(us["w8a8"], 1),
        "ratio": round(us["bf16"] / us["int8"], 2),
        "w8a8_ratio": round(us["bf16"] / us["w8a8"], 2),
        "max_rel_err": round(float(rel), 4),
        "note": "per-iter incl. shared back-projection+tanh",
    }
    print(name, results[name], flush=True)
print(json.dumps(results))
