"""GPipe-style SPMD pipeline parallelism over a mesh axis.

New capability beyond the reference (SURVEY §2.6: the reference is
data-parallel only — DistributedGradReducer all-reduce, no TP/PP/SP). Here a
stack of identical layers (e.g. Conformer encoder blocks) is split into
``pipe_size`` contiguous stages, one per device along the ``pipe`` mesh axis,
and the batch is split into microbatches that stream through the stages:

  tick t:  every stage applies its local layers to its current activation,
           then the activation hops one stage forward with a single
           ``jax.lax.ppermute`` (one ICI hop — the ``pipe`` axis is the
           innermost mesh dim, see parallel/mesh.make_mesh). Stage 0 ingests
           microbatch ``t``; the last stage banks a finished microbatch from
           tick ``S-1`` on.

The whole schedule is ONE ``lax.scan`` inside ``shard_map``, so XLA sees a
static single program: forward AND backward differentiate through the scan
(the reverse pass replays the pipeline in reverse order, ppermute transposes
to the opposite rotation — GPipe's backward schedule falls out of AD for
free). Bubble overhead is the usual (S-1)/(M+S-1); pick
``num_microbatches >= 4 * pipe_size`` to amortize.

Composes with data parallelism: pass ``batch_axis="data"`` and the
microbatch rows are additionally sharded over the ``data`` axis (each
data-parallel slice runs its own pipeline over the same stage weights).

Typical use — stack the per-layer param trees of L identical blocks
(``jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer_params)``) and call
:func:`pipeline_apply` with the single-layer apply function.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["pipeline_spmd", "pipeline_apply", "stack_layer_params"]


def stack_layer_params(per_layer_params):
    """Stack L per-layer param pytrees into one tree with leading dim L."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *per_layer_params)


def _apply_stage(layer_fn, stage_params, x, extras):
    """Apply this stage's local layers (leading dim of ``stage_params``)
    sequentially; the scan keeps the stage a single compiled loop."""

    def body(h, p):
        return layer_fn(p, h, *extras), None

    h, _ = jax.lax.scan(body, x, stage_params)
    return h


def pipeline_spmd(layer_fn, stage_params, microbatches, extras=(),
                  batched=(), axis_name: str = "pipe"):
    """The per-device pipeline schedule. Must run inside ``shard_map`` with
    ``axis_name`` bound; ``stage_params`` is the LOCAL stage's layer stack
    (global layer dim already split over the axis), ``microbatches`` is the
    full ``(M, mb, ...)`` stack (replicated over the pipe axis).

    ``batched`` entries are per-microbatch side inputs stacked ``(M, ...)``
    (e.g. attention masks): at tick ``t`` stage ``s`` is processing
    microbatch ``t - s``, so each stage dynamic-indexes its CURRENT
    microbatch's entry and passes it to ``layer_fn`` after ``extras``.

    Returns the ``(M, mb, ...)`` outputs, replicated over the pipe axis.
    """
    size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    n_micro = microbatches.shape[0]
    # no wraparound: the last stage's output is banked, not forwarded
    perm = [(i, i + 1) for i in range(size - 1)]

    # the carry becomes device-varying after the first ppermute, so its
    # initial value must already carry the `pipe` vma type (jax >= 0.8
    # shard_map enforces scan carry types; pcast replaces older pvary)
    def _varying(x):
        pcast = getattr(jax.lax, "pcast", None)
        if pcast is not None:
            return pcast(x, (axis_name,), to="varying")
        pvary = getattr(jax.lax, "pvary", None)
        return pvary(x, (axis_name,)) if pvary is not None else x

    state = _varying(jnp.zeros_like(microbatches[0]))
    outbuf = _varying(jnp.zeros_like(microbatches))

    def tick(carry, t):
        state, outbuf = carry
        # stage 0 ingests microbatch t (clamped past the end: those ticks
        # only drain the pipe and their stage-0 compute is discarded)
        mb = jax.lax.dynamic_index_in_dim(
            microbatches, jnp.minimum(t, n_micro - 1), 0, keepdims=False)
        inp = jnp.where(idx == 0, mb, state)
        # this stage is working on microbatch t - idx (clamped at the rims,
        # where the compute is warm-up/drain filler that is never banked)
        mb_idx = jnp.clip(t - idx, 0, n_micro - 1)
        b_ex = tuple(
            jax.lax.dynamic_index_in_dim(e, mb_idx, 0, keepdims=False)
            for e in batched)
        y = _apply_stage(layer_fn, stage_params, inp, tuple(extras) + b_ex)
        # last stage banks microbatch t-(S-1) from tick S-1 on
        out_t = t - (size - 1)
        write = (idx == size - 1) & (out_t >= 0)
        written = jax.lax.dynamic_update_index_in_dim(
            outbuf, y, jnp.maximum(out_t, 0), 0)
        outbuf = jnp.where(write, written, outbuf)
        if size > 1:
            state = jax.lax.ppermute(y, axis_name, perm)
        else:
            state = y
        return (state, outbuf), None

    (_, outbuf), _ = jax.lax.scan(
        tick, (state, outbuf), jnp.arange(n_micro + size - 1))
    # replicate the finished outputs (held by the last stage) to every stage
    return jax.lax.psum(
        jnp.where(idx == size - 1, outbuf, jnp.zeros_like(outbuf)), axis_name)


def pipeline_apply(layer_fn, stacked_params, x, mesh: Mesh, *,
                   num_microbatches: int, extras=(), extras_specs=None,
                   batched_extras=(), axis_name: str = "pipe",
                   batch_axis: Optional[str] = "data"):
    """Run ``x`` through L stacked layers as a ``pipe``-axis pipeline.

    Args:
        layer_fn: ``(params_l, h, *extras, *batched) -> h`` — one layer's
            apply. ``batched`` entries arrive as this microbatch's rows.
        stacked_params: param pytree with leading layer dim L on every leaf
            (see :func:`stack_layer_params`); L must divide evenly into
            ``mesh.shape[axis_name]`` stages.
        x: global input ``(B, ...)``; B must divide ``num_microbatches``
            (and the microbatch rows the ``batch_axis`` size, when given).
        extras: replicated side inputs forwarded to every layer call
            (e.g. positional embedding, rng key data).
        extras_specs: optional per-entry ``PartitionSpec`` for ``extras``
            (default: all replicated).
        batched_extras: side inputs with a leading GLOBAL batch dim B
            (e.g. attention masks): reshaped to ``(M, B/M, ...)`` and
            dynamic-indexed so each stage sees its CURRENT microbatch's
            rows — required for DPxPP, where a replicated whole-batch mask
            would shape-mismatch the split microbatch rows.
        batch_axis: also shard microbatch rows over this axis (DP x PP);
            ``None`` replicates the batch over the whole mesh.

    Returns:
        ``(B, ...)`` outputs, numerically equal to applying the L layers
        sequentially (tested in tests/test_pipeline.py).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    size = mesh.shape[axis_name]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % size != 0:
        raise ValueError(f"{n_layers} layers not divisible into {size} stages")
    batch = x.shape[0]
    if batch % num_microbatches != 0:
        raise ValueError(f"batch {batch} not divisible by {num_microbatches} "
                         "microbatches")
    mb = batch // num_microbatches
    x_mb = x.reshape((num_microbatches, mb) + x.shape[1:])
    batched_mb = tuple(
        e.reshape((num_microbatches, mb) + e.shape[1:])
        for e in batched_extras)

    bspec = (batch_axis if batch_axis and mesh.shape.get(batch_axis, 1) > 1
             else None)
    param_specs = jax.tree_util.tree_map(
        lambda _: P(axis_name), stacked_params)
    mb_spec = P(None, bspec)
    if extras_specs is None:
        extras_specs = tuple(P() for _ in extras)
    batched_specs = tuple(mb_spec for _ in batched_mb)

    mapped = shard_map(
        functools.partial(pipeline_spmd, layer_fn, axis_name=axis_name),
        mesh=mesh,
        in_specs=(param_specs, mb_spec, tuple(extras_specs), batched_specs),
        out_specs=mb_spec,
    )
    out = mapped(stacked_params, x_mb, tuple(extras), batched_mb)
    return out.reshape((batch,) + out.shape[2:])
