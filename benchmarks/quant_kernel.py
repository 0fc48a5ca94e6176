"""int8 dequant-in-VMEM matmul vs XLA bf16 at serving shapes (PERF.md).

Run on a real chip: python benchmarks/quant_kernel.py
"""
import sys, time, json
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from mindaudio_tpu.ops.quant import int8_matmul, quantize_int8

rng = np.random.default_rng(0)
results = {}
for name, (m, k, n) in {
    "ffn_up_T64":   (64, 256, 2048),     # streaming chunk FFN
    "ffn_up_T4096": (4096, 256, 2048),   # batch-16 full-utterance FFN
    "vocab_proj":   (4096, 256, 4233),   # CTC projection
}.items():
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    vq, s = quantize_int8(w)
    vq_d, s_d = jnp.asarray(vq), jnp.asarray(s)
    wb = jnp.asarray(w, jnp.bfloat16)

    # the weight-resident (N-outer, M-inner) grid is general across M now —
    # no fallback, default tiling
    f_q = jax.jit(lambda x: int8_matmul(x, vq_d, s_d))
    f_b = jax.jit(lambda x: (x @ wb).astype(jnp.float32))
    # correctness
    a, b = np.asarray(f_q(x)), np.asarray(f_b(x))
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    # timing
    def bench(f):
        for _ in range(5): f(x).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(50): y = f(x)
            y.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / 50)
        return best * 1e6
    us_q, us_b = bench(f_q), bench(f_b)
    results[name] = {"int8_us": round(us_q, 1), "bf16_us": round(us_b, 1),
                     "ratio": round(us_b / us_q, 2), "max_rel_err": round(float(rel), 4)}
    print(name, results[name], flush=True)
print(json.dumps(results))
