"""Optax-style LR schedules: step → learning rate.

Ports of reference ``mindaudio/scheduler/scheduler_factory.py``:
``ASRWarmupLR`` (:14, Noam), ``ASRLearningRate`` (:55, warmup + polynomial
decay), ``CosineLearningRate`` (:93), ``step_lr`` (:127), plus the recipes'
exponential decay (examples/fastspeech2/train.py:181-188) and cyclic
triangular LR (examples/ECAPA-TDNN/train_speaker_embeddings.py:418-424).
All return callables usable directly as optax schedules; a plain
Python int step works too (each schedule coerces with ``jnp.asarray``).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "asr_warmup_lr",
    "warmup_poly_lr",
    "cosine_lr",
    "step_lr",
    "exponential_decay_lr",
    "cyclic_triangular_lr",
]


def asr_warmup_lr(lr, warmup_steps=25000, start_steps=0):
    """Noam warmup: ``lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)``."""

    def schedule(step):
        s = jnp.maximum(jnp.asarray(step) + start_steps, 1).astype(jnp.float32)
        return lr * warmup_steps**0.5 * jnp.minimum(s**-0.5, s * warmup_steps**-1.5)

    return schedule


def warmup_poly_lr(lr, min_lr, warmup_steps, total_steps, power=1.0, start_steps=0):
    """Linear warmup then polynomial decay to ``min_lr``."""

    def schedule(step):
        s = (jnp.asarray(step) + start_steps).astype(jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        frac = jnp.clip((s - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        decay = (lr - min_lr) * (1.0 - frac) ** power + min_lr
        return jnp.where(s < warmup_steps, warm, decay)

    return schedule


def cosine_lr(lr, min_lr, warmup_steps, total_steps, start_steps=0):
    """Linear warmup then cosine decay to ``min_lr``."""

    def schedule(step):
        s = (jnp.asarray(step) + start_steps).astype(jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        frac = jnp.clip((s - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        decay = min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(s < warmup_steps, warm, decay)

    return schedule


def step_lr(lr, epoch_size, factor=0.5, interval=2):
    """Halve (by ``factor``) every ``interval`` epochs (reference :127)."""

    def schedule(step):
        epoch = jnp.asarray(step) // epoch_size
        return lr * factor ** (epoch // interval).astype(jnp.float32)

    return schedule


def exponential_decay_lr(lr, decay_rate, decay_steps, staircase=True,
                         warmup_steps=0):
    """``lr * decay_rate^(step / decay_steps)``, with optional linear warmup.

    ``warmup_steps > 0`` ramps 0→lr linearly first. Post-norm transformer
    stacks (the FastSpeech2 FFT encoder/decoder) NEED this: Adam at 1e-3
    from step 0 through ≥4 post-LN blocks lands in an input-independent
    basin within ~50 steps and never escapes (measured — a 4-block stack
    could not fit 16 utterances at lr 1e-3 but fits easily with warmup;
    see examples/fastspeech2/convergence_run.py protocol notes).
    """

    def schedule(step):
        s = jnp.asarray(step).astype(jnp.float32)
        p = s / decay_steps
        if staircase:
            p = jnp.floor(p)
        base = lr * decay_rate**p.astype(jnp.float32)
        if warmup_steps <= 0:
            return base
        return jnp.where(s < warmup_steps, lr * s / warmup_steps, base)

    return schedule


def cyclic_triangular_lr(min_lr, max_lr, step_size):
    """Triangular cyclic LR (ECAPA recipe)."""

    def schedule(step):
        step = jnp.asarray(step)
        cycle = jnp.floor(1 + step / (2 * step_size))
        x = jnp.abs(step / step_size - 2 * cycle + 1)
        return min_lr + (max_lr - min_lr) * jnp.maximum(0.0, 1.0 - x)

    return schedule


# Reference-name aliases (scheduler_factory.py classes were per-step
# callables; these schedules are the same contract): migration convenience.
ASRWarmupLR = asr_warmup_lr
ASRLearningRate = warmup_poly_lr
CosineLearningRate = cosine_lr

__all__ += ["ASRWarmupLR", "ASRLearningRate", "CosineLearningRate"]
