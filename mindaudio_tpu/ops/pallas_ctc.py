"""Pallas TPU kernel: CTC forward/backward dynamic program in VMEM.

Why a kernel: the CTC recursion is T' sequential steps (249 at the
1000-frame bucket, 752 at the 3000-frame one) of tiny ``(B, 2L+1)``
elementwise work. As a ``lax.scan`` each step is an XLA loop iteration
with fixed bookkeeping overhead that dwarfs its ~microsecond of VPU math —
the full-step ablation in PERF.md charges ~3.8 ms of a 33 ms Conformer
step to the scan (and round 4's unroll sweep showed unrolling can't
recover it). Here the whole DP runs inside one Pallas program: the
``(B, S)`` alpha row lives in a VMEM scratch that persists across a
T-chunked grid, each time step is a handful of VPU ops on a
``(B, 128)`` f32 tile, and the per-step XLA overhead disappears.

Formulation (canonical Graves 2006 extended-label DP, not optax's
phi/emit split — the symmetric alpha/beta form is what makes the
backward pass a second kernel of the same shape):

  ext labels  : [b, l0, b, l1, ..., b]            S = 2L+1, b = blank
  alpha_t(s)  = logp_t(ext_s) + LSE(alpha_{t-1}(s), alpha_{t-1}(s-1),
                                    alpha_{t-1}(s-2) if allowed(s))
  allowed(s)  = ext_s != blank  and  ext_s != ext_{s-2}
  loss        = -LSE(alpha_{T-1}(2L), alpha_{T-1}(2L-1))

Backward (custom VJP, second kernel running t := T-1 .. 0):

  w_t(s)      = logp_t(ext_s) + beta_t(s)
  beta_t(s)   = LSE(w_{t+1}(s), w_{t+1}(s+1), w_{t+1}(s+2) if allowed(s+2))
  dL/dlogp_t(ext_s) = -exp(alpha_t(s) + beta_t(s) + L)

The gather ``logp[..., ext]`` and its scatter-adjoint stay OUTSIDE the
custom-vjp boundary, so log-softmax and vocab-scatter gradients come from
ordinary autodiff; the kernel pair only owns the sequential DP.

Replaces the reference's ``ops.CTCLossV2`` native kernel (reference
loss/ctc_loss.py:10-87) on the performance path; ``loss/ctc_loss.py``
keeps the scan implementation as the CPU/equality-test path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ctc_per_seq_loss_pallas"]

_LOG_EPS = -1e5
_LANES = 128
_SUBLANES = 8


def _round_up(x, m):
    return (x + m - 1) // m * m


def _shift_right(x, k, fill):
    """Along the last (lane) axis: out[..., s] = x[..., s-k], front-filled."""
    pad = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def _shift_left(x, k, fill):
    """Along the last (lane) axis: out[..., s] = x[..., s+k], back-filled."""
    pad = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
    return jnp.concatenate([x[..., k:], pad], axis=-1)


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def _fwd_kernel(len_ref, logp_ref, allow_ref, alpha_out_ref, carry_ref, *,
                tc):
    """One grid step: advance the alpha row through ``tc`` time steps.

    logp_ref:   (tc, B, S) this chunk's extended-label log-probs
    allow_ref:  (B, S) additive mask, 0 where the s-2 skip is allowed
    alpha_out:  (tc, B, S) alphas for this chunk (backward residual)
    carry_ref:  (B, S) VMEM scratch — alpha row, persists across the grid
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s_idx = jax.lax.broadcasted_iota(
            jnp.int32, carry_ref.shape, dimension=1)
        carry_ref[:] = jnp.where(s_idx == 0, 0.0, _LOG_EPS)

    allow = allow_ref[:]
    lens = len_ref[:]  # (B, 1) int32

    def step(k, _):
        a_prev = carry_ref[:]
        sh1 = _shift_right(a_prev, 1, _LOG_EPS)
        sh2 = _shift_right(a_prev, 2, _LOG_EPS) + allow
        a_new = logp_ref[k] + _lse3(a_prev, sh1, sh2)
        t = i * tc + k
        a_new = jnp.where(lens > t, a_new, a_prev)
        alpha_out_ref[k] = a_new
        carry_ref[:] = a_new
        return 0

    jax.lax.fori_loop(0, tc, step, 0, unroll=True)


def _bwd_kernel(len_ref, logp_ref, alpha_ref, term_ref, allow2_ref,
                scale_ref, grad_out_ref, carry_ref, *, tc, num_chunks):
    """Reverse grid step: betas for ``tc`` time steps + grad wrt logp_ext.

    Runs with reversed index maps — grid step i processes time chunk
    (num_chunks-1-i), and the inner loop walks the chunk back to front.

    term_ref:   (B, S) terminal betas (0 at s = 2L, 2L-1, else LOG_EPS)
    allow2_ref: (B, S) additive mask, 0 where position s+2 allows the skip
                (i.e. allowed(s+2) shifted into frame s)
    scale_ref:  (B, 2) f32 — [:, 0] = loss_b, [:, 1] = upstream cotangent
    carry_ref:  (B, S) VMEM scratch — w_{t+1} = logp_{t+1} + beta_{t+1}
    """
    i = pl.program_id(0)
    allow2 = allow2_ref[:]
    lens = len_ref[:]
    loss_b = scale_ref[:, 0:1]
    g_b = scale_ref[:, 1:2]
    term = term_ref[:]

    @pl.when(i == 0)
    def _init():
        carry_ref[:] = jnp.full(carry_ref.shape, _LOG_EPS)

    def step(kk, _):
        k = tc - 1 - kk
        t = (num_chunks - 1 - i) * tc + k
        w_next = carry_ref[:]
        sh1 = _shift_left(w_next, 1, _LOG_EPS)
        sh2 = _shift_left(w_next, 2, _LOG_EPS) + allow2
        beta_rec = _lse3(w_next, sh1, sh2)
        beta = jnp.where(lens - 1 == t, term,
                         jnp.where(lens - 1 > t, beta_rec, _LOG_EPS))
        grad_out_ref[k] = -jnp.exp(alpha_ref[k] + beta + loss_b) * g_b
        carry_ref[:] = logp_ref[k] + beta
        return 0

    jax.lax.fori_loop(0, tc, step, 0, unroll=True)


def _pad_args(logp_ext, logit_lengths, allowed, tc):
    """(B,T,S) → time-major (T_pad, B_pad, S_pad) + padded masks.

    ``allow`` comes back as the ADDITIVE form the kernels consume:
    0 where the s-2 skip is allowed, LOG_EPS where it is not.
    """
    b, t, s = logp_ext.shape
    b_pad = _round_up(b, _SUBLANES)
    s_pad = _round_up(s + 2, _LANES)  # +2: shifted reads never wrap junk in
    t_pad = _round_up(t, tc)
    logp = jnp.pad(logp_ext, ((0, b_pad - b), (0, t_pad - t), (0, s_pad - s)),
                   constant_values=_LOG_EPS)
    logp = jnp.transpose(logp, (1, 0, 2))
    lens = jnp.pad(logit_lengths.astype(jnp.int32), (0, b_pad - b))[:, None]
    allow = jnp.where(
        jnp.pad(allowed, ((0, b_pad - b), (0, s_pad - s))),
        0.0, _LOG_EPS).astype(jnp.float32)
    return logp, lens, allow, b_pad, s_pad, t_pad


def _interpret():
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_dp(logp_ext, logit_lengths, allowed, label_lengths, tc):
    loss, _ = _ctc_dp_fwd(logp_ext, logit_lengths, allowed, label_lengths, tc)
    return loss


def _run_fwd(logp, lens, allow, tc):
    t_pad, b_pad, s_pad = logp.shape
    num_chunks = t_pad // tc
    return pl.pallas_call(
        functools.partial(_fwd_kernel, tc=tc),
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, s_pad), jnp.float32),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b_pad, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, b_pad, s_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), jnp.float32)],
        interpret=_interpret(),
    )(lens, logp, allow)


def _ctc_dp_fwd(logp_ext, logit_lengths, allowed, label_lengths, tc):
    b, t, s = logp_ext.shape
    logp, lens, allow, b_pad, s_pad, t_pad = _pad_args(
        logp_ext, logit_lengths, allowed, tc)
    alphas = _run_fwd(logp, lens, allow, tc)

    # loss from the alpha row at each sequence's last valid frame
    last_t = jnp.clip(logit_lengths.astype(jnp.int32) - 1, 0, t - 1)
    last = jnp.take_along_axis(
        alphas[:, :b, :], last_t[None, :, None], axis=0)[0]  # (B, s_pad)
    s2 = 2 * label_lengths.astype(jnp.int32)
    a2 = jnp.take_along_axis(last, s2[:, None], axis=1)[:, 0]
    a1 = jnp.take_along_axis(
        last, jnp.maximum(s2 - 1, 0)[:, None], axis=1)[:, 0]
    loss = -jnp.where(label_lengths > 0, jnp.logaddexp(a2, a1), a2)
    residuals = (logp, lens, allow, alphas, label_lengths, loss,
                 (b, t, s))
    return loss, residuals


def _ctc_dp_bwd(tc, residuals, g):
    logp, lens, allow, alphas, label_lengths, loss, (b, t, s) = residuals
    t_pad, b_pad, s_pad = logp.shape
    num_chunks = t_pad // tc

    # terminal betas: 0 at s = 2L and (if L > 0) 2L-1
    s_idx = jnp.arange(s_pad)[None, :]
    s2 = 2 * label_lengths.astype(jnp.int32)[:, None]
    term = jnp.where(
        (s_idx == s2) | ((s_idx == s2 - 1) & (s2 > 0)), 0.0, _LOG_EPS)
    term = jnp.pad(term, ((0, b_pad - b), (0, 0)),
                   constant_values=_LOG_EPS).astype(jnp.float32)

    # allowed(s+2), expressed in frame-s coordinates (additive mask)
    allow2 = _shift_left(allow, 2, _LOG_EPS)

    scale = jnp.stack(
        [jnp.pad(loss, (0, b_pad - b)),
         jnp.pad(g.astype(jnp.float32), (0, b_pad - b))], axis=1)

    rev = lambda i: (num_chunks - 1 - i, 0, 0)
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, tc=tc, num_chunks=num_chunks),
        out_shape=jax.ShapeDtypeStruct((t_pad, b_pad, s_pad), jnp.float32),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b_pad, s_pad), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, b_pad, s_pad), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tc, b_pad, s_pad), rev,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b_pad, s_pad), jnp.float32)],
        interpret=_interpret(),
    )(lens, logp, alphas, term, allow2, scale)

    g_logp_ext = jnp.transpose(grads[:t, :b, :s], (1, 0, 2))
    return g_logp_ext, None, None, None


_ctc_dp.defvjp(_ctc_dp_fwd, _ctc_dp_bwd)


def ctc_per_seq_loss_pallas(logits, logit_lengths, labels, label_lengths,
                            blank_id=0, time_chunk=64):
    """Per-sequence CTC negative log-likelihood ``(B,)`` — Pallas DP.

    Same contract as ``loss.ctc_loss.ctc_per_seq_loss``; equality (value
    and gradient) is asserted in ``tests/test_pallas_ctc.py``.
    """
    b, t, _ = logits.shape
    n = labels.shape[1]
    s = 2 * n + 1

    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32))
    labels = labels.astype(jnp.int32)
    ext = jnp.full((b, s), blank_id, jnp.int32).at[:, 1::2].set(labels)
    # gather stays outside the custom-vjp: its adjoint (vocab scatter-add)
    # and log-softmax's come from ordinary autodiff
    logp_ext = jnp.take_along_axis(logprobs, ext[:, None, :], axis=2)

    s_idx = jnp.arange(s)[None, :]
    allowed = (ext != blank_id) & (ext != jnp.roll(ext, 2, axis=1)) \
        & (s_idx >= 2)

    tc = min(time_chunk, _round_up(t, 8))
    return _ctc_dp(logp_ext, logit_lengths, allowed, label_lengths, tc)
