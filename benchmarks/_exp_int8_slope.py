"""Round 3: slope-timed int8 experiments.

Previous rounds timed total/ITERS, but the remote-tunnel dispatch+fetch is
~20-30 ms per CALL — at ITERS=400 that adds a constant ~60 us/iter to every
variant, squashing all ratios toward 1 (and the round-3 PERF.md table was
measured at ITERS=200: ~120 us/iter of dispatch on 130-280 us numbers).

Fix: time the same jitted fori_loop at two iteration counts and use the
SLOPE (T(n2) - T(n1)) / (n2 - n1) — the per-call constant cancels exactly.
"""
import sys, os, time, json, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N1, N2 = 400, 2400
rng = np.random.default_rng(0)


def slope_us(make_loop, *args):
    """make_loop(n) -> jitted fn(*args); returns per-iter us via slope."""
    f1, f2 = make_loop(N1), make_loop(N2)
    float(f1(*args)); float(f2(*args))
    best1 = best2 = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); float(f1(*args))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f2(*args))
        best2 = min(best2, time.perf_counter() - t0)
    return (best2 - best1) / (N2 - N1) * 1e6


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
    return pl.pallas_call(
        _w8a8_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid=(m // bm,),
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
    #"ffn_down":  (4096, 2048, 256),
    #"vocab":     (4096, 256, 4352),
    #"square2k":  (2048, 2048, 2048),
}.items():
    x0 = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    wb = jnp.asarray(w, jnp.bfloat16)
    sw = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / sw), -127, 127).astype(np.int8))
    sw_d = jnp.asarray(sw.astype(np.float32))
    xq0 = jnp.asarray(
        np.clip(np.round(np.asarray(x0, np.float32) / 0.03), -127, 127).astype(np.int8))

    def mk_bf16(iters):
        def loop(x, wb):
            def body(i, xx):
                y = jnp.dot(xx, wb, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return chain(y, xx)
            return jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32).sum()
        return jax.jit(loop)

    def mk_i8_static(iters):
        def loop(xq, wq):
            def body(i, xx):
                y = jax.lax.dot_general(xx, wq, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                s = (y.sum(axis=1, keepdims=True) >> 31).astype(jnp.int8)
                return xx ^ s[:, :1]
            return jax.lax.fori_loop(0, iters, body, xq).astype(jnp.float32).sum()
        return jax.jit(loop)

    def mk_i8_dyn(iters):
        def loop(x, wq, sw):
            def body(i, xx):
                xf = xx.astype(jnp.float32)
                sx = jnp.maximum(jnp.abs(xf).max(axis=1, keepdims=True), 1e-12) / 127.0
                q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
                acc = jax.lax.dot_general(q, wq, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                y = (acc.astype(jnp.float32) * sx * sw[None, :]).astype(jnp.bfloat16)
                return chain(y, xx)
            return jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32).sum()
        return jax.jit(loop)

    def mk_pallas(iters):
        def loop(x, wq, sw):
            def body(i, xx):
                y = pallas_w8a8(xx, wq, sw)
                return chain(y, xx)
            return jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32).sum()
        return jax.jit(loop)

    us = {
        "bf16": slope_us(mk_bf16, x0, wb),
        "i8_static": slope_us(mk_i8_static, xq0, wq),
        "i8_dyn": slope_us(mk_i8_dyn, x0, wq, sw_d),
        "pallas_w8a8": slope_us(mk_pallas, x0, wq, sw_d),
    }
    gflop = 2 * m * k * n / 1e9
    row = {v: round(t, 1) for v, t in us.items()}
    row["bf16_tflops"] = round(gflop / us["bf16"] * 1e3, 1)
    row["i8_static_tops"] = round(gflop / us["i8_static"] * 1e3, 1)
    row["pallas_tops"] = round(gflop / us["pallas_w8a8"] * 1e3, 1)
    row["r_static"] = round(us["bf16"] / us["i8_static"], 2)
    row["r_dyn"] = round(us["bf16"] / us["i8_dyn"], 2)
    row["r_pallas"] = round(us["bf16"] / us["pallas_w8a8"], 2)
    results[name] = row
    print(name, row, flush=True)
print(json.dumps(results))
