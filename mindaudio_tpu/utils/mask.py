"""Attention-mask builders (jittable, static-shape).

Device ports of reference ``mindaudio/utils/mask.py``: pad masks
(mask.py:44/70), subsequent mask (mask.py:19), chunk masks for streaming
Conformer (mask.py:169/201). All return boolean arrays where True = attend /
valid, and are pure functions of lengths — safe inside jit with static T.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "make_pad_mask",
    "make_non_pad_mask",
    "subsequent_mask",
    "subsequent_chunk_mask",
    "add_optional_chunk_mask",
    "mask_finished_scores",
    "mask_finished_preds",
]

NEG_INF = -1.0e9


def mask_finished_scores(score, end_flag):
    """Beam-search bookkeeping (reference mask.py:98): for finished rows
    keep exactly one alive branch — branch 0 gets score 0, the rest -inf.

    Args:
        score: ``(B*beam, beam)`` float candidate scores.
        end_flag: ``(B*beam, 1)`` bool, True where the hypothesis ended.
    """
    score = jnp.asarray(score)
    finished = jnp.asarray(end_flag, bool)
    beam = score.shape[-1]
    first = jnp.arange(beam) == 0
    keep_zero = finished & first[None, :]
    kill = finished & ~first[None, :]
    return jnp.where(kill, NEG_INF, jnp.where(keep_zero, 0.0, score))


def mask_finished_preds(pred, end_flag, eos):
    """Beam-search bookkeeping (reference mask.py:126): finished rows
    predict ``eos`` on every branch.

    Args:
        pred: ``(B*beam, beam)`` int predictions.
        end_flag: ``(B*beam, 1)`` bool.
    """
    pred = jnp.asarray(pred)
    finished = jnp.asarray(end_flag, bool)
    return jnp.where(finished, jnp.asarray(eos, pred.dtype), pred)


def make_pad_mask(lengths, max_len):
    """True at padded positions: ``(B, max_len)`` (reference mask.py:44)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return idx >= lengths[:, None].astype(jnp.int32)


def make_non_pad_mask(lengths, max_len):
    """True at valid positions (reference mask.py:70)."""
    return ~make_pad_mask(lengths, max_len)


def subsequent_mask(size):
    """Lower-triangular causal mask ``(size, size)`` (reference mask.py:19)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    return col <= row


def subsequent_chunk_mask(size, chunk_size, num_left_chunks=-1):
    """Chunked streaming mask: each frame attends to its chunk plus
    ``num_left_chunks`` previous chunks (reference mask.py:169).
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    chunk_end = (row // chunk_size + 1) * chunk_size
    ok = col < jnp.minimum(chunk_end, size)
    if num_left_chunks >= 0:
        start = jnp.maximum((row // chunk_size - num_left_chunks) * chunk_size, 0)
        ok = ok & (col >= start)
    return ok


def add_optional_chunk_mask(
    masks,
    use_dynamic_chunk,
    use_dynamic_left_chunk,
    decoding_chunk_size,
    static_chunk_size,
    num_decoding_left_chunks,
    rng_key=None,
):
    """Combine the pad mask with an (optionally random-size) chunk mask.

    ``masks``: ``(B, 1, T)`` non-pad mask. Returns a ``(B, T, T)`` attention
    mask when chunking applies, else the ``(B, 1, T)`` pad mask unchanged
    (broadcast-equivalent: every query row sees the same key mask, and not
    materializing T×T saves HBM). Mirrors the reference's training-time
    dynamic chunk sampling (mask.py:201-254): with ``use_dynamic_chunk`` the
    chunk size is drawn in [1, max_len], using full context half of the time.
    """
    size = masks.shape[-1]
    if use_dynamic_chunk:
        if decoding_chunk_size < 0:
            return masks
        if decoding_chunk_size > 0:
            cm = subsequent_chunk_mask(size, decoding_chunk_size, num_decoding_left_chunks)
            return masks & cm[None]
        # Training: sample chunk size — full context w.p. 1/2, else in [1, 25]
        # (reference mask.py:235-254). Traced chunk size ⇒ build the mask with
        # broadcast arithmetic, not a static helper.
        assert rng_key is not None, "dynamic chunk sampling needs an rng key"
        k1, k2 = jax.random.split(rng_key)
        draw = jax.random.randint(k1, (), 1, size + 1)
        chunk = jnp.where(draw > size // 2, size, draw % 25 + 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
        chunk_end = (row // chunk + 1) * chunk
        cm = col < jnp.minimum(chunk_end, size)
        if use_dynamic_left_chunk:
            max_left = (size - 1) // jnp.maximum(chunk, 1)
            num_left = jax.random.randint(k2, (), 0, jnp.maximum(max_left, 1))
            start = jnp.maximum((row // chunk - num_left) * chunk, 0)
            cm = cm & (col >= start)
        return masks & cm[None]
    if static_chunk_size > 0:
        cm = subsequent_chunk_mask(size, static_chunk_size, num_decoding_left_chunks)
        return masks & cm[None]
    return masks
