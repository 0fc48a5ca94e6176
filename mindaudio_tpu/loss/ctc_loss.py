"""CTC loss on TPU.

Replaces the reference's ``ops.CTCLossV2`` native kernel (reference
loss/ctc_loss.py:10-87) with an on-chip log-alpha forward recursion
(Graves 2006), the same math as ``optax.ctc_loss`` but shaped for the TPU
scheduler:

- ``lax.scan(..., unroll=k)``: the recursion is T' (~249 at the 1000-frame
  bucket) SEQUENTIAL steps of tiny (B, L) elementwise work — per-step
  overhead dominates. Unrolling k steps per loop iteration amortizes it and
  lets XLA fuse across steps. unroll=16/32 were probed at the full-step
  level (round 4) and landed inside the ±3.5 ms variant-order drift even
  within one process — a reversed-order A/B (8,16,16,8) read 36.6/32.9/
  36.3/33.1 ms, i.e. position, not unroll, moved the number. 8 stays.
- no per-step (T, B, L) output stacking: only the final carry is needed for
  the loss, so the scan carries two (B, L) rows instead of materializing
  2 x (T, B, L+1) alpha tensors.

``tests/test_train_infra.py`` asserts value+grad equality vs optax.
Interface: time-major-free, batched, mask-aware, mean over batch like the
reference's ``reduction='mean'``.

A Pallas DP kernel exists as an explicit alternative
(``impl="pallas"`` -> ``ops.pallas_ctc.ctc_per_seq_loss_pallas`` — the
whole T-step recursion inside one kernel with the alpha row in VMEM);
value/grad equality of the two paths is asserted in
``tests/test_pallas_ctc.py``. It is NOT the default: the round-5
within-process full-step A/B on a v5e chip (``benchmarks/ctc_step_ab.py``,
slope-timed fori_loop pairs, flagship B=32 x 10 s config) measured the
scan step at 28.15 ms (43.9% MFU) vs 30.02 ms (41.2% MFU) with the
kernel — the custom call breaks XLA's fusion/overlap around the loss at
these shapes (B=32, L=20: the DP rows are far smaller than a VPU tile),
so ``impl="auto"`` keeps the scan everywhere. Caveat if you opt in: under
plain GSPMD pjit the pallas_call is an opaque custom call (XLA gathers
its operands); per-shard tracing under ``shard_map`` runs it locally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ctc_loss", "ctc_per_seq_loss"]

_LOG_EPS = -1e5


def _use_pallas(impl):
    # "auto" is the scan on every backend: the full-step A/B (module
    # docstring) measured the Pallas kernel 1.9 ms/step SLOWER at flagship
    # shapes. The kernel stays available as an explicit opt-in.
    return impl == "pallas"


def ctc_per_seq_loss(logits, logit_lengths, labels, label_lengths,
                     blank_id=0, unroll=8, impl="auto"):
    """Per-sequence CTC negative log-likelihood, ``(B,)``.

    ``impl``: "auto" (the scan — measured fastest, see module docstring),
    "scan", or
    "pallas".
    """
    if _use_pallas(impl):
        from mindaudio_tpu.ops.pallas_ctc import ctc_per_seq_loss_pallas

        return ctc_per_seq_loss_pallas(
            logits, logit_lengths, labels, label_lengths, blank_id=blank_id)
    return _ctc_per_seq_loss_scan(logits, logit_lengths, labels,
                                  label_lengths, blank_id=blank_id,
                                  unroll=unroll)


def _ctc_per_seq_loss_scan(logits, logit_lengths, labels, label_lengths,
                           blank_id=0, unroll=8):
    """The ``lax.scan`` recursion (CPU/equality path)."""
    b, t, num_classes = logits.shape
    n = labels.shape[1]
    logit_pads = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(
        jnp.float32)

    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32))
    # repeat[b, i] == 1 when labels[b, i] == labels[b, i+1]
    repeat = (labels[:, :-1] == labels[:, 1:]).astype(jnp.float32)
    repeat = jnp.pad(repeat, ((0, 0), (0, 1)))

    logprobs_phi = jnp.transpose(logprobs[:, :, blank_id:blank_id + 1],
                                 (1, 0, 2))  # (T, B, 1)
    one_hot = jax.nn.one_hot(labels, num_classes=num_classes)  # (B, N, K)
    logprobs_emit = jnp.transpose(
        jnp.einsum("btk,bnk->btn", logprobs, one_hot), (1, 0, 2))  # (T, B, N)

    phi_init = jnp.full((b, n + 1), _LOG_EPS).at[:, 0].set(0.0)
    emit_init = jnp.full((b, n), _LOG_EPS)

    def update_phi(phi, added):
        return jnp.concatenate(
            [phi[:, :1], jnp.logaddexp(phi[:, 1:], added)], axis=-1)

    def loop_body(prev, x):
        prev_phi, prev_emit = prev
        prev_phi_orig = prev_phi
        # emit->phi epsilon transition, except when the next label repeats
        prev_phi = update_phi(prev_phi, prev_emit + _LOG_EPS * repeat)

        logprob_emit, logprob_phi, pad = x
        # phi->emit and emit self-loop
        next_emit = jnp.logaddexp(prev_phi[:, :-1] + logprob_emit,
                                  prev_emit + logprob_emit)
        # phi self-loop + emit->phi blank transition (repetition case)
        next_phi = prev_phi + logprob_phi
        next_phi = update_phi(next_phi,
                              prev_emit + logprob_phi + _LOG_EPS * (1.0 - repeat))

        pad = pad.reshape((b, 1))
        next_emit = pad * prev_emit + (1.0 - pad) * next_emit
        next_phi = pad * prev_phi_orig + (1.0 - pad) * next_phi
        return (next_phi, next_emit), None

    xs = (logprobs_emit, logprobs_phi, logit_pads.T)
    (phi, emit), _ = jax.lax.scan(loop_body, (phi_init, emit_init), xs,
                                  unroll=unroll)
    phi_last = update_phi(phi, emit)

    label_lens = label_lengths.astype(jnp.int32)
    sel = jax.nn.one_hot(label_lens, num_classes=n + 1)
    return -jnp.einsum("bn,bn->b", phi_last, sel)


def ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id=0,
             unroll=8, impl="auto"):
    """Mean CTC negative log-likelihood.

    Args:
        logits: ``(B, T, vocab)`` unnormalized scores (log-softmax applied
            internally).
        logit_lengths: ``(B,)`` valid frame counts.
        labels: ``(B, L)`` target ids padded with anything (masked by
            ``label_lengths``); must not contain ``blank_id`` in valid slots.
        label_lengths: ``(B,)`` target lengths.
        blank_id: CTC blank index (reference uses 0 for DS2, vocab-1 option for
            Conformer via config).
        unroll: scan steps fused per loop iteration (scan path only).
        impl: "auto" (the scan — measured fastest, see module docstring),
            "scan", or
            "pallas".

    Returns:
        scalar mean loss over the batch.
    """
    return ctc_per_seq_loss(logits, logit_lengths, labels, label_lengths,
                            blank_id=blank_id, unroll=unroll,
                            impl=impl).mean()
