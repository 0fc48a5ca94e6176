"""Isolation experiment: where does the v5e int8 MXU 2x rate go?

Variants per shape, each timed as an in-jit fori_loop with a CHEAP data
dependency (y row-sum scaled by 0 added back to x — forces the matmul,
adds O(MN) VPU work, no second matmul diluting the ratio):

  bf16      : x @ w (bf16)
  i8_static : xq @ wq int8 dot_general -> int32 (quantization OUTSIDE loop)
              — pure int8 MXU rate through XLA
  i8_dyn    : per-row quantize x in-loop, int8 dot, rescale epilogue
              — realistic W8A8 training forward cost
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp

ITERS = 400
rng = np.random.default_rng(0)

def timeit(fn, *args):
    float(fn(*args))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e6

def chain(y, xx):
    # data dependency that forces full computation of y but costs ~nothing:
    # row-sum of y, scaled to zero, broadcast-added back
    return xx + (y.sum(axis=1, keepdims=True) * 0).astype(xx.dtype)[:, :1]

results = {}
for name, (m, k, n) in {
    "ffn_up":    (4096, 256, 2048),
    "ffn_down":  (4096, 2048, 256),
    "vocab":     (4096, 256, 4233),
    "square2k":  (2048, 2048, 2048),
    "square4k":  (4096, 4096, 4096),
}.items():
    x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    wb = jnp.asarray(w, jnp.bfloat16)
    # pre-quantized operands
    sw = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / sw), -127, 127).astype(np.int8))
    sw_d = jnp.asarray(sw.astype(np.float32))
    xq0 = jnp.asarray(
        np.clip(np.round(np.asarray(x0, np.float32) / 0.03), -127, 127).astype(np.int8))

    def loop_bf16(x, wb):
        def body(i, xx):
            y = jnp.dot(xx, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return chain(y, xx)
        return jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()

    def loop_i8_static(xq, wq):
        def body(i, xx):
            y = jax.lax.dot_general(xx, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # chain through int: row-sum, *0, add back
            return xx + (y.sum(axis=1, keepdims=True) * 0).astype(jnp.int8)[:, :1]
        return jax.lax.fori_loop(0, ITERS, body, xq).astype(jnp.float32).sum()

    def loop_i8_dyn(x, wq, sw):
        def body(i, xx):
            xf = xx.astype(jnp.float32)
            sx = jnp.maximum(jnp.abs(xf).max(axis=1, keepdims=True), 1e-12) / 127.0
            q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(q, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * sx * sw[None, :]).astype(jnp.bfloat16)
            return chain(y, xx)
        return jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()

    us = {
        "bf16": timeit(jax.jit(loop_bf16), x0, wb),
        "i8_static": timeit(jax.jit(loop_i8_static), xq0, wq),
        "i8_dyn": timeit(jax.jit(loop_i8_dyn), x0, wq, sw_d),
    }
    gflop = 2 * m * k * n / 1e9
    row = {v: round(t, 1) for v, t in us.items()}
    row["bf16_tflops"] = round(gflop / us["bf16"] * 1e3, 1)
    row["i8_static_tops"] = round(gflop / us["i8_static"] * 1e3, 1)
    row["ratio_static"] = round(us["bf16"] / us["i8_static"], 2)
    row["ratio_dyn"] = round(us["bf16"] / us["i8_dyn"], 2)
    results[name] = row
    print(name, row, flush=True)
print(json.dumps(results))
