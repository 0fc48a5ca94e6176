"""Sequence-parallel ring attention over a mesh axis.

New capability beyond the reference (SURVEY §5.7: the reference has NO
sequence parallelism — long audio is handled only by bucketing and chunked
attention masks). Here the time axis of Q/K/V is sharded over the ``seq``
mesh axis; each device computes blockwise attention against its local KV
shard while rotating the KV shards around the ring with
``jax.lax.ppermute`` (one ICI hop per step), accumulating the softmax in
streaming (flash-attention) form. Peak memory per device is
O(T_local * T_local) instead of O(T^2), and the KV transfer overlaps with
the block matmuls under XLA's latency-hiding scheduler.

Use ``ring_attention`` inside ``shard_map`` (or let ``sequence_parallel_attention``
set that up from a mesh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "ring_attention",
    "ulysses_attention",
    "sequence_parallel_attention",
]

NEG_INF = -1.0e30


def ring_attention(q, k, v, kv_valid=None, axis_name: str = "seq", scale=None):
    """Streaming-softmax attention with KV rotating around ``axis_name``.

    Must run inside ``shard_map``/``pmap`` with ``axis_name`` bound.

    Args:
        q/k/v: local shards ``(B, H, T_loc, D)`` (time sharded over the ring).
        kv_valid: optional ``(B, T_loc)`` bool, True = valid key position
            (padding mask; rotates with k/v).
        scale: score scale, default ``D**-0.5``.

    Returns:
        ``(B, H, T_loc, D)`` attention output for the local queries.
    """
    n = jax.lax.psum(1, axis_name)
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    q = q * jnp.asarray(scale, q.dtype)

    # derive the accumulators from q/k so they carry the same varying-manual-
    # axes type as the inputs (shard_map's scan carry typing requires it);
    # the output feature dim follows v, not q (q may carry an augmented head
    # dim, e.g. the rel-pos folding in models/layers.py)
    acc = (q[..., :1].astype(jnp.float32) * 0.0
           + v[:, :, :1, :1].astype(jnp.float32) * 0.0
           + jnp.zeros(q.shape[:-1] + (v.shape[-1],), jnp.float32))
    m = q[..., 0].astype(jnp.float32) * 0.0 + NEG_INF
    l = q[..., 0].astype(jnp.float32) * 0.0
    if kv_valid is None:
        kv_valid = k[:, 0, :, 0] * 0.0 == 0.0  # all-True, varying like k

    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(i, carry):
        acc, m, l, k, v, kv_valid = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        s = jnp.where(kv_valid[:, None, None, :], s, NEG_INF)

        m_new = jnp.maximum(m, s.max(-1))
        p = jnp.exp(s - m_new[..., None])
        # fully-masked rows produce exp(NEG_INF - NEG_INF) = 1; zero them
        p = jnp.where(kv_valid[:, None, None, :], p, 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), v
        ).astype(jnp.float32)

        # rotate KV (and its validity) one hop around the ring
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        kv_valid = jax.lax.ppermute(kv_valid, axis_name, perm)
        return acc, m_new, l, k, v, kv_valid

    acc, m, l, _, _, _ = jax.lax.fori_loop(0, n, body, (acc, m, l, k, v, kv_valid))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def ulysses_attention(q, k, v, kv_valid=None, axis_name: str = "seq", scale=None):
    """Ulysses-style sequence parallelism: all-to-all head↔time redistribution.

    The cheaper SP alternative to :func:`ring_attention` when the head count
    covers the mesh axis (SURVEY §5.7 north star lists both): one tiled
    ``all_to_all`` turns time-sharded ``(B, H, T_loc, D)`` shards into
    head-sharded ``(B, H/n, T, D)`` shards, each device runs ordinary dense
    attention over the *full* sequence for its head subset (one fused MXU
    matmul chain, no per-hop ppermute latency), and a second ``all_to_all``
    restores time sharding. Two collectives total vs the ring's n hops —
    wins whenever ``H % n == 0`` and the full T×T score tile fits in HBM.

    Must run inside ``shard_map``/``pmap`` with ``axis_name`` bound.
    Args/returns as :func:`ring_attention`.
    """
    n = jax.lax.psum(1, axis_name)
    h = q.shape[1]
    if h % n != 0:
        raise ValueError(f"head count {h} not divisible by mesh axis size {n}")
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale

    # (B, H, T_loc, D) -> (B, H/n, T, D): scatter heads, gather time
    a2a = functools.partial(
        jax.lax.all_to_all, axis_name=axis_name, split_axis=1, concat_axis=2,
        tiled=True,
    )
    qg, kg, vg = a2a(q), a2a(k), a2a(v)

    s = jnp.einsum("bhqd,bhkd->bhqk", qg * jnp.asarray(scale, q.dtype), kg)
    s = s.astype(jnp.float32)
    if kv_valid is not None:
        valid = jax.lax.all_gather(kv_valid, axis_name, axis=1, tiled=True)
        s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if kv_valid is not None:
        # fully-masked query rows: softmax over all-NEG_INF is uniform; the
        # ring path returns 0 there, keep the two variants interchangeable
        p = jnp.where(valid[:, None, None, :], p, 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vg.dtype), vg)

    # (B, H/n, T, D) -> (B, H, T_loc, D): scatter time, gather heads
    return jax.lax.all_to_all(
        out, axis_name=axis_name, split_axis=2, concat_axis=1, tiled=True
    ).astype(q.dtype)


def sequence_parallel_attention(
    q, k, v, mesh: Mesh, kv_valid=None, seq_axis: str = "seq",
    batch_axis: Optional[str] = "data", variant: str = "ring",
    scale=None,
):
    """shard_map wrapper: global ``(B, H, T, D)`` arrays in, attention out.

    ``T`` is sharded over ``seq_axis`` (and ``B`` over ``batch_axis`` when
    given) — the drop-in sequence-parallel replacement for a full
    ``softmax(QK^T)V`` on long audio. ``variant`` picks the collective
    pattern: ``"ring"`` (ppermute KV rotation, any head count, O(T_loc²)
    memory) or ``"ulysses"`` (two all-to-alls, needs ``H % axis_size == 0``).
    ``scale`` overrides the default ``D**-0.5`` score scale (needed when the
    head dim was augmented, e.g. the rel-pos folding in models/layers.py).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    bspec = batch_axis if batch_axis and mesh.shape.get(batch_axis, 1) > 1 else None
    qkv_spec = P(bspec, None, seq_axis, None)
    valid_spec = P(bspec, seq_axis)

    impl = {"ring": ring_attention, "ulysses": ulysses_attention}[variant]
    fn = functools.partial(impl, axis_name=seq_axis, scale=scale)
    if kv_valid is None:
        mapped = shard_map(
            lambda q, k, v: fn(q, k, v),
            mesh=mesh, in_specs=(qkv_spec,) * 3, out_specs=qkv_spec,
        )
        return mapped(q, k, v)
    mapped = shard_map(
        lambda q, k, v, val: fn(q, k, v, kv_valid=val),
        mesh=mesh, in_specs=(qkv_spec,) * 3 + (valid_spec,), out_specs=qkv_spec,
    )
    return mapped(q, k, v, kv_valid)
