"""Round 2: valid int8-static chain + fused Pallas W8A8 kernel.

The previous i8_static chain multiplied an integer sum by 0 — exact for
ints, so XLA folded it and DCE'd the matmul (measured "2255 TOPS").
Fix: chain via arithmetic-shift sign bits XOR'd into the operand.
"""
import sys, os, time, json, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ---------------- fused Pallas W8A8: quantize x in VMEM, int8 MXU ----------
def _w8a8_kernel(x_ref, w_ref, sw_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True), 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf * pl.reciprocal(sx, approx=False)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(q, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx * sw_ref[:].astype(jnp.float32)
                ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm",))
def pallas_w8a8(x, wq, sw, bm=512):
    m, k = x.shape
    n = wq.shape[1]
    grid = (m // bm,)
    return pl.pallas_call(
        _w8a8_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, wq, sw.reshape(1, -1))


def chain(y, xx):
    return xx + (y.sum(axis=1, keepdims=True) * 0).astype(xx.dtype)[:, :1]


results = {}
for name, (m, k, n) in {
    "ffn_up":    (4096, 256, 2048),
    "ffn_down":  (4096, 2048, 256),
    "vocab":     (4096, 256, 4352),
    "square2k":  (2048, 2048, 2048),
}.items():
    x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    wb = jnp.asarray(w, jnp.bfloat16)
    sw = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / sw), -127, 127).astype(np.int8))
    sw_d = jnp.asarray(sw.astype(np.float32))
    xq0 = jnp.asarray(
        np.clip(np.round(np.asarray(x0, np.float32) / 0.03), -127, 127).astype(np.int8))

    # correctness of the pallas kernel vs f32 reference
    ref = np.asarray(x0, np.float32) @ (np.asarray(wq, np.float32) * sw[None, :])
    got = np.asarray(pallas_w8a8(x0, wq, sw_d), np.float32)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)

    def loop_bf16(x, wb):
        def body(i, xx):
            y = jnp.dot(xx, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return chain(y, xx)
        return jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()

    def loop_i8_static(xq, wq):
        def body(i, xx):
            y = jax.lax.dot_general(xx, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # sign bits of the row sums: data-dependent, not constant-foldable
            s = (y.sum(axis=1, keepdims=True) >> 31).astype(jnp.int8)
            return xx ^ s[:, :1]
        return jax.lax.fori_loop(0, ITERS, body, xq).astype(jnp.float32).sum()

    def loop_pallas(x, wq, sw):
        def body(i, xx):
            y = pallas_w8a8(xx, wq, sw)
            return chain(y, xx)
        return jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32).sum()

    us = {
        "bf16": timeit(jax.jit(loop_bf16), x0, wb),
        "i8_static": timeit(jax.jit(loop_i8_static), xq0, wq),
        "pallas_w8a8": timeit(jax.jit(loop_pallas), x0, wq, sw_d),
    }
    gflop = 2 * m * k * n / 1e9
    row = {v: round(t, 1) for v, t in us.items()}
    row["bf16_tflops"] = round(gflop / us["bf16"] * 1e3, 1)
    row["i8_static_tops"] = round(gflop / us["i8_static"] * 1e3, 1)
    row["pallas_tops"] = round(gflop / us["pallas_w8a8"] * 1e3, 1)
    row["ratio_pallas"] = round(us["bf16"] / us["pallas_w8a8"], 2)
    row["rel_err"] = round(float(rel), 4)
    results[name] = row
    print(name, row, flush=True)
print(json.dumps(results))
