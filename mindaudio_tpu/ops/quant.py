"""Weight-only int8 matmul for serving (Pallas TPU kernel + host reference).

Small-batch inference (streaming ASR, beam steps) is weight-bound: a
(T, 256) @ (256, 2048) FFN matmul at T<=64 reads ~1 MB of weights per ~0.1
MFLOP. Storing weights as int8 with per-output-channel scales halves the
HBM traffic vs bf16 (4x vs f32) — the dequantize happens in VMEM inside the
kernel, so the bf16 copy never exists in HBM. On the MXU the matmul still
runs in bf16 with f32 accumulation, so results match the bf16 path to
quantization error (~1e-2 relative for unit-scale weights).

No reference counterpart (the reference serves fp16 graphs); this is the
TPU-native production-serving building block. Use:

    wq, scale = quantize_int8(w)           # offline, per output channel
    y = int8_matmul(x, wq, scale)          # == x @ (wq * scale), fused
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "quantize_int8",
    "int8_matmul",
    "int8_dynamic_matmul",
    "int8_training_matmul",
    "dequantize_int8",
    "quantize_dense_params",
    "intercept_dense_int8",
    "strip_quantized",
]


def quantize_int8(w):
    """Per-output-channel symmetric int8 quantization.

    Args:
        w: (K, N) float weights.

    Returns:
        (values int8 (K, N), scales f32 (N,)) with
        ``values * scales ≈ w``.
    """
    w = np.asarray(w, np.float32)
    amax = np.maximum(np.abs(w).max(axis=0), 1e-12)
    scales = (amax / 127.0).astype(np.float32)
    values = np.clip(np.round(w / scales[None, :]), -127, 127).astype(np.int8)
    return values, scales


def dequantize_int8(values, scales):
    """Host/jnp reference: (K, N) int8 * (N,) scales → f32."""
    return jnp.asarray(values, jnp.float32) * jnp.asarray(scales)[None, :]


def _int8_matmul_kernel(x_ref, w_ref, s_ref, o_ref, wde_ref):
    # x: (TM, K) bf16 — w: (K, TN) int8 — s: (1, TN) f32 — o: (TM, TN) f32
    # Grid is (N-blocks, M-blocks): M iterates INNERMOST, so the int8 weight
    # tile (index map constant in the inner dim) stays VMEM-resident across
    # all M-blocks and is dequantized ONCE per N-tile into the persistent
    # scratch — the old (M, N) grid re-fetched AND re-dequantized it per
    # M-block, which is why training-sized M needed an XLA fallback.
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _dequant():
        wde_ref[:] = w_ref[:].astype(jnp.bfloat16) * s_ref[:].astype(
            jnp.bfloat16)

    # f32 accumulation on the MXU; the store narrows to the output dtype
    # (bf16 out halves the dominant HBM stream at large M — XLA can't fuse
    # a cast into an opaque Pallas output, so the kernel does it itself)
    o_ref[:] = jnp.dot(x_ref[:], wde_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def _pick_tiles(m, k, n, out_bytes):
    """Choose ``(block_m, block_n)``: minimize padded compute first, then
    maximize tile size under the VMEM budget.

    Two measured failure modes of a fixed choice (PERF.md round-3 int8
    microbench): (a) ``block_m=128`` at training sizes (M=4096, K=256) makes
    32 tiny sequential grid steps whose pipeline overhead loses 25% to XLA's
    bf16 matmul; (b) picking the largest VMEM-fitting ``block_n`` without
    looking at padding turned N=2048/K=2048 into a 1792-tile → padded-3584
    layout, 75% wasted compute on the second tile. Budget accounting below
    doubles the in/out tiles (Pallas double-buffers the pipelined refs);
    the dequant scratch is single-buffered.
    """
    m_pad = -(-max(m, 1) // 128) * 128
    n_pad = -(-n // 128) * 128
    best = None
    for bm in (1024, 512, 256, 128):
        if bm > m_pad:
            continue
        for i in range(1, n_pad // 128 + 1):
            bn = i * 128
            padded = (-(-m_pad // bm) * bm) * (-(-n_pad // bn) * bn)
            use = (2 * (2 * bm * k)          # bf16 x tile, double-buffered
                   + 2 * (k * bn)            # int8 w tile, double-buffered
                   + 2 * k * bn              # bf16 dequant scratch
                   + 2 * (out_bytes * bm * bn)  # out tile, double-buffered
                   + 2 * (4 * bn))           # scales
            if use > _VMEM_BUDGET:
                continue
            key = (-padded, bm, bn)  # less padding, then bigger tiles
            if best is None or key > best[0]:
                best = (key, bm, bn)
    if best is None:
        return 128, 128
    return best[1], best[2]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def int8_matmul(x, values, scales, block_m=None, block_n=None, interpret=False):
    """``x @ (values * scales)`` with int8 weights dequantized in VMEM.

    General for any M (serving AND training sizes): the weight never takes
    an HBM round-trip at bf16 width — total HBM traffic is
    ``K*N`` int8 (once) + ``M*K*ceil(N/TN)`` activations + ``M*N`` out,
    vs XLA's dequantize-then-matmul which writes and re-reads a 2-4x wider
    bf16 weight copy.

    Args:
        x: (..., K) activations (any float dtype; computed in bf16).
        values: (K, N) int8 weights.
        scales: (N,) f32 per-output-channel scales.
        block_n: N-tile; default picks the largest VMEM-fitting tile
            (usually all of N — then x streams through exactly once).

    Returns:
        (..., N) in x's dtype (f32 accumulation inside; the narrowing to
        bf16 happens in the kernel's store, so a bf16 caller never pays an
        f32-width output round-trip through HBM).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_dtype = x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = values.shape[1]
    x2 = x.reshape(-1, k).astype(jnp.bfloat16)
    m = x2.shape[0]

    # pad to tile multiples (the MXU wants aligned tiles; K is unpadded —
    # it is the contraction dim and d_model/ffn dims are already 128-aligned
    # in this framework)
    out_dtype = orig_dtype if orig_dtype in (jnp.bfloat16, jnp.float16,
                                             jnp.float32) else jnp.float32
    auto_m, auto_n = _pick_tiles(m, k, n, jnp.dtype(out_dtype).itemsize)
    block_m = block_m or auto_m
    block_n = block_n or auto_n
    xp = _pad_to(x2, block_m, 0)
    mp = xp.shape[0]
    wp = _pad_to(values, block_n, 1)
    sp = _pad_to(scales.reshape(1, -1).astype(jnp.float32), block_n, 1)
    np_ = wp.shape[1]
    grid = (np_ // block_n, mp // block_m)  # M innermost: weight stays put
    out = pl.pallas_call(
        _int8_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k, block_n), jnp.bfloat16)],
        interpret=interpret,
    )(xp, wp, sp)
    return out[:m, :n].reshape(*lead, n).astype(orig_dtype)


@jax.jit
def int8_dynamic_matmul(x, values, scales):
    """W8A8: dynamically quantize activations per row and run the int8 MXU.

    Weight-only int8 (:func:`int8_matmul`) still computes in bf16, so at
    compute-bound shapes it can at best MATCH bf16. The v5e MXU runs int8 x
    int8 → int32 at 2x the bf16 rate (394.5 TOP/s vs 197 TFLOP/s), so
    quantizing the activation tile too is the only int8 path that can beat
    bf16 where the matmul is compute-bound (large M serving batches). The
    row-wise symmetric activation quantization and the (sx ⊗ sw) rescale
    epilogue are cheap VPU elementwise ops XLA fuses around the matmul.

    Accuracy: per-row activations + per-channel weights keeps the relative
    error at the ~1% W8A8 level — serving-grade, not training-grade.

    Args:
        x: (..., K) float activations.
        values: (K, N) int8 weights.
        scales: (N,) f32 per-output-channel weight scales.

    Returns:
        (..., N) in x's dtype.
    """
    orig_dtype = x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k).astype(jnp.float32)
    sx = jnp.maximum(jnp.abs(x2).max(axis=1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, values, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * scales[None, :].astype(jnp.float32)
    return y.reshape(*lead, values.shape[1]).astype(orig_dtype)


def _w8a8_apply(x2, w):
    """(M, K) x (K, N) through the int8 MXU with fresh dynamic scales.

    Per-row activation scales + per-output-channel weight scales, both
    recomputed from the live values (training weights change every step).
    The v5e int8 systolic array runs 2x the bf16 rate; slope-timed at the
    flagship FFN shape (4096x256x2048) this path measures 1.38x XLA bf16
    end-to-end including the quantization VPU work (benchmarks, round 4 —
    the round-3 "1.02-1.06x" table was per-call dispatch overhead
    amortized over too few in-jit iterations, not device time).
    """
    xf = x2.astype(jnp.float32)
    sx = jnp.maximum(jnp.abs(xf).max(axis=1, keepdims=True), 1e-12) * (1 / 127.0)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.abs(wf).max(axis=0, keepdims=True), 1e-12) * (1 / 127.0)
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw


@jax.custom_vjp
def int8_training_matmul(x, w):
    """``x @ w`` with a W8A8 int8-MXU forward and a bf16 backward.

    The TRAINING counterpart of :func:`int8_dynamic_matmul`: ``w`` is the
    live f32 parameter (quantized fresh each step, per output channel), the
    forward runs int8 x int8 → int32 on the MXU, and the backward is the
    standard straight-through estimator — ``dx = g @ wᵀ`` and
    ``dw = xᵀ @ g`` computed in bf16 from the UNQUANTIZED saved operands,
    so gradient quality is identical to the bf16 step and only the forward
    pays the ~1% W8A8 rounding error.

    Args:
        x: ``(..., K)`` activations (any float dtype).
        w: ``(K, N)`` float weights.

    Returns:
        ``(..., N)`` in ``x``'s dtype.
    """
    lead = x.shape[:-1]
    y = _w8a8_apply(x.reshape(-1, x.shape[-1]), w)
    return y.reshape(*lead, w.shape[1]).astype(x.dtype)


def _int8_training_fwd(x, w):
    return int8_training_matmul(x, w), (x, w)


def _int8_training_bwd(res, g):
    x, w = res
    lead = x.shape[:-1]
    k = x.shape[-1]
    g2 = g.reshape(-1, g.shape[-1]).astype(jnp.bfloat16)
    x2 = x.reshape(-1, k).astype(jnp.bfloat16)
    dx = jax.lax.dot_general(
        g2, w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(*lead, k).astype(x.dtype)
    dw = jax.lax.dot_general(
        x2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    return dx, dw


int8_training_matmul.defvjp(_int8_training_fwd, _int8_training_bwd)


def quantize_dense_params(params, min_weights=65536):
    """Pre-quantize every large 2-D ``kernel`` leaf of a params tree.

    Walks ``params``; a leaf at ``(..., 'kernel')`` with 2 dims and at least
    ``min_weights`` elements gets a per-channel int8 table. Returns
    ``{module_path_tuple: (values int8, scales f32)}`` keyed by the OWNING
    module's path (what ``context.module.path`` reports inside
    ``nn.intercept_methods``). Small kernels stay bf16 — they are not
    weight-traffic-bound and quantization error buys nothing.
    """
    import jax.tree_util as jtu

    tables = {}
    flat = jtu.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", getattr(p, "name", None)) for p in path)
        if keys[-1:] == ("kernel",) and getattr(leaf, "ndim", 0) == 2 \
                and leaf.size >= min_weights:
            tables[keys[:-1]] = quantize_int8(np.asarray(leaf))
    return tables


def intercept_dense_int8(tables, interpret=None):
    """Context manager: route matching ``nn.Dense`` calls through
    :func:`int8_matmul` with the pre-quantized weights.

    Use around ``model.apply`` (including inside jit tracing). Modules whose
    path is not in ``tables`` run unchanged. ``interpret`` defaults to True
    off-TPU so the Pallas kernel runs in interpreter mode in CPU tests.
    """
    import flax.linen as nn

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    jtables = {
        path: (jnp.asarray(v), jnp.asarray(s)) for path, (v, s) in tables.items()
    }

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, nn.Dense) and context.method_name == "__call__"
                and tuple(mod.path) in jtables):
            vq, sc = jtables[tuple(mod.path)]
            x = args[0]
            y = int8_matmul(x, vq, sc, interpret=interpret)
            if mod.use_bias:
                bias = mod.get_variable("params", "bias")
                y = y + jnp.asarray(bias, y.dtype)
            return y
        return next_fun(*args, **kwargs)

    return nn.intercept_methods(interceptor)


def strip_quantized(params, tables):
    """Replace quantized kernels with empty placeholders to free HBM.

    Under :func:`intercept_dense_int8` those kernels are never read; the
    returned tree keeps the structure (flax never validates unused leaves)
    while dropping the f32 copies.
    """
    import jax.tree_util as jtu

    def walk(tree, prefix=()):
        if isinstance(tree, dict):
            return {
                k: (jnp.zeros((0,), jnp.float32)
                    if k == "kernel" and prefix in tables
                    else walk(v, prefix + (k,)))
                for k, v in tree.items()
            }
        return tree

    # flax params may be a FrozenDict
    try:
        from flax.core import FrozenDict, freeze, unfreeze

        if isinstance(params, FrozenDict):
            return freeze(walk(unfreeze(params)))
    except Exception:
        pass
    return walk(params)
