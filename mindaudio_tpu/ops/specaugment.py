"""PRNG-keyed, batched, jittable SpecAugment.

Device replacement for the reference's host-side spectrogram masking
(reference augment.py:28-98 / msaudio Frequency/TimeMasking, and the conformer
recipe's inline ``spec_aug`` at examples/conformer/dataset.py:493): masks are
built from ``broadcasted_iota`` comparisons so the op is pure dataflow — no
in-place writes, vmappable over the batch, and it fuses into the feature
pipeline inside the training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["mask_along_axis", "spec_augment"]


def _band_mask(key, length, max_width):
    """Sample one [start, start+width) band; returns a bool (length,) mask."""
    kw, ks = jax.random.split(key)
    width = jax.random.randint(kw, (), 0, max_width + 1)
    start = jax.random.randint(ks, (), 0, jnp.maximum(length - width, 0) + 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (length, 1), 0)[:, 0]
    return (idx >= start) & (idx < start + width)


@functools.partial(jax.jit, static_argnames=("axis", "max_width", "num_masks"))
def mask_along_axis(key, spec, max_width, axis, num_masks=1, mask_value=0.0):
    """Mask ``num_masks`` random bands along ``axis`` of ``(B, ..., freq, time)``.

    A different mask is drawn per batch element (iid) — the behavior training
    recipes actually want.
    """
    length = spec.shape[axis]
    batch = spec.shape[0]

    def one_mask(k):
        ks = jax.random.split(k, num_masks)
        m = jnp.zeros((length,), bool)
        for i in range(num_masks):
            m = m | _band_mask(ks[i], length, max_width)
        return m

    masks = jax.vmap(one_mask)(jax.random.split(key, batch))  # (B, length)
    shape = [1] * spec.ndim
    shape[0] = batch
    shape[axis] = length
    masks = masks.reshape(shape)
    return jnp.where(masks, jnp.asarray(mask_value, spec.dtype), spec)


@functools.partial(
    jax.jit,
    static_argnames=("num_t_mask", "num_f_mask", "max_t", "max_f", "time_axis", "freq_axis"),
)
def spec_augment(
    key,
    spec,
    num_t_mask=2,
    num_f_mask=2,
    max_t=50,
    max_f=10,
    time_axis=-2,
    freq_axis=-1,
):
    """Standard SpecAugment (2 time + 2 freq masks by default) on a batch.

    Default axes assume model-ready time-major features ``(B, time, freq)``
    (the conformer recipe layout, examples/conformer/dataset.py:493-535);
    pass ``time_axis=-1, freq_axis=-2`` for ``(B, freq, time)`` spectrograms.
    """
    kt, kf = jax.random.split(key)
    time_axis = time_axis % spec.ndim
    freq_axis = freq_axis % spec.ndim
    out = mask_along_axis(kt, spec, max_t, time_axis, num_masks=num_t_mask)
    out = mask_along_axis(kf, out, max_f, freq_axis, num_masks=num_f_mask)
    return out
