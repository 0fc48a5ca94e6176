"""Equality tests for the Pallas CTC DP kernel (ops/pallas_ctc.py).

The kernel replaces the reference's native ``ops.CTCLossV2`` (reference
loss/ctc_loss.py:10-87) on the TPU performance path; the scan recursion in
``loss/ctc_loss.py`` stays the CPU/equality path. These tests assert value
AND gradient equality between the two on the CPU mesh (the kernel runs in
Pallas interpret mode there), including the length edge cases the DP is
most likely to get wrong: empty labels, full-length sequences, repeated
labels, and the minimal T = 2L+1 fit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindaudio_tpu.loss.ctc_loss import ctc_per_seq_loss
from mindaudio_tpu.ops.pallas_ctc import ctc_per_seq_loss_pallas


def _compare(logits, logit_lens, labels, label_lens, blank_id=0,
             time_chunk=64, rtol=1e-5, atol=1e-6):
    """Value + grad equality of the Pallas DP vs the scan recursion."""

    def mean_scan(lg):
        return ctc_per_seq_loss(lg, logit_lens, labels, label_lens,
                                blank_id=blank_id, impl="scan").mean()

    def mean_pallas(lg):
        return ctc_per_seq_loss_pallas(lg, logit_lens, labels, label_lens,
                                       blank_id=blank_id,
                                       time_chunk=time_chunk).mean()

    want_v, want_g = jax.value_and_grad(mean_scan)(logits)
    got_v, got_g = jax.value_and_grad(mean_pallas)(logits)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=rtol)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-4, atol=atol)
    # per-sequence values too (the mean can hide compensating errors)
    per_scan = ctc_per_seq_loss(logits, logit_lens, labels, label_lens,
                                blank_id=blank_id, impl="scan")
    per_pallas = ctc_per_seq_loss_pallas(logits, logit_lens, labels,
                                         label_lens, blank_id=blank_id,
                                         time_chunk=time_chunk)
    np.testing.assert_allclose(np.asarray(per_pallas), np.asarray(per_scan),
                               rtol=rtol, atol=atol)


class TestPallasCTC:
    def test_mixed_lengths_and_repeats(self):
        """Random batch: ragged logit/label lengths + a repeated label
        (exercises the allowed(s) skip gate)."""
        rng = np.random.default_rng(0)
        b, t, k, n = 4, 37, 11, 9
        logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
        logit_lens = jnp.asarray([37, 25, 10, 30], jnp.int32)
        labels = jnp.asarray(rng.integers(1, k, (b, n)), jnp.int32)
        labels = labels.at[0, 2].set(labels[0, 1])  # repeat → no s-2 skip
        labels = labels.at[3, 1].set(labels[3, 0])
        label_lens = jnp.asarray([9, 5, 2, 4], jnp.int32)
        _compare(logits, logit_lens, labels, label_lens)

    def test_empty_label(self):
        """L = 0: the loss is the all-blank path probability."""
        rng = np.random.default_rng(1)
        b, t, k, n = 3, 17, 7, 5
        logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
        logit_lens = jnp.asarray([17, 9, 3], jnp.int32)
        labels = jnp.asarray(rng.integers(1, k, (b, n)), jnp.int32)
        label_lens = jnp.asarray([0, 3, 0], jnp.int32)
        _compare(logits, logit_lens, labels, label_lens)

    def test_minimal_fit_t_equals_2l_plus_1(self):
        """T exactly 2L+1: only one path through the DP trellis."""
        rng = np.random.default_rng(2)
        b, t, k, n = 2, 9, 6, 4
        logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
        logit_lens = jnp.asarray([9, 9], jnp.int32)
        labels = jnp.asarray(rng.integers(1, k, (b, n)), jnp.int32)
        label_lens = jnp.asarray([4, 4], jnp.int32)  # 2*4+1 = 9 = T
        _compare(logits, logit_lens, labels, label_lens)

    def test_full_length_no_padding(self):
        """logit_lengths == T for every row (no frozen-alpha region)."""
        rng = np.random.default_rng(3)
        b, t, k, n = 2, 24, 8, 6
        logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
        logit_lens = jnp.full((b,), t, jnp.int32)
        labels = jnp.asarray(rng.integers(1, k, (b, n)), jnp.int32)
        label_lens = jnp.asarray([6, 4], jnp.int32)
        _compare(logits, logit_lens, labels, label_lens)

    @pytest.mark.parametrize("time_chunk", [8, 16, 64])
    def test_chunking_invariance(self, time_chunk):
        """The T-chunked grid must give identical results for any chunk size,
        including T not a multiple of the chunk."""
        rng = np.random.default_rng(4)
        b, t, k, n = 3, 29, 10, 7
        logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
        logit_lens = jnp.asarray([29, 20, 13], jnp.int32)
        labels = jnp.asarray(rng.integers(1, k, (b, n)), jnp.int32)
        label_lens = jnp.asarray([7, 5, 3], jnp.int32)
        _compare(logits, logit_lens, labels, label_lens,
                 time_chunk=time_chunk)

    def test_nonzero_blank_id(self):
        """Conformer configs can put blank at vocab-1 (reference
        examples/conformer/conformer.yaml ctc blank option)."""
        rng = np.random.default_rng(5)
        b, t, k, n = 2, 19, 9, 5
        blank = k - 1
        logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
        logit_lens = jnp.asarray([19, 12], jnp.int32)
        labels = jnp.asarray(rng.integers(0, blank, (b, n)), jnp.int32)
        label_lens = jnp.asarray([5, 3], jnp.int32)
        _compare(logits, logit_lens, labels, label_lens, blank_id=blank)

    def test_matches_optax_directly(self):
        """Triangulate: the kernel also matches optax.ctc_loss, not just our
        scan (guards against a shared bug in the two in-repo paths)."""
        import optax

        rng = np.random.default_rng(6)
        b, t, k, n = 3, 31, 12, 8
        logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
        logit_lens = jnp.asarray([31, 22, 11], jnp.int32)
        labels = jnp.asarray(rng.integers(1, k, (b, n)), jnp.int32)
        label_lens = jnp.asarray([8, 4, 1], jnp.int32)

        def optax_mean(lg):
            lp = (jnp.arange(t)[None] >= logit_lens[:, None]).astype(
                jnp.float32)
            labp = (jnp.arange(n)[None] >= label_lens[:, None]).astype(
                jnp.float32)
            return optax.ctc_loss(lg, lp, labels, labp, blank_id=0).mean()

        def pallas_mean(lg):
            return ctc_per_seq_loss_pallas(lg, logit_lens, labels,
                                           label_lens).mean()

        want_v, want_g = jax.value_and_grad(optax_mean)(logits)
        got_v, got_g = jax.value_and_grad(pallas_mean)(logits)
        np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   rtol=1e-4, atol=1e-5)

    def test_jit_and_grad_under_jit(self):
        """The custom-vjp pair must be jittable end to end (the train step
        wraps it in jax.value_and_grad under jax.jit)."""
        rng = np.random.default_rng(7)
        b, t, k, n = 2, 21, 8, 5
        logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
        logit_lens = jnp.asarray([21, 15], jnp.int32)
        labels = jnp.asarray(rng.integers(1, k, (b, n)), jnp.int32)
        label_lens = jnp.asarray([5, 3], jnp.int32)

        @jax.jit
        def step(lg):
            return jax.value_and_grad(
                lambda x: ctc_per_seq_loss_pallas(
                    x, logit_lens, labels, label_lens).mean())(lg)

        v, g = step(logits)
        want = ctc_per_seq_loss(logits, logit_lens, labels,
                                label_lens, impl="scan").mean()
        np.testing.assert_allclose(float(v), float(want), rtol=1e-5)
        assert np.isfinite(np.asarray(g)).all()
