"""W8A8 int8-MXU training forward (ops/quant.py int8_training_matmul,
models/layers.py Int8Dense, ASRModel(int8_ffn=True)).

The int8 forward must stay within W8A8 rounding error of the bf16 matmul,
the custom-vjp backward must be the straight-through bf16 gradient, and the
int8 model must be checkpoint-compatible with the bf16 one (same param tree,
same names/shapes — Int8Dense mirrors nn.Dense's params exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def model_and_batch():
    from mindaudio_tpu.models.asr_model import ASRModel
    from mindaudio_tpu.utils.common import add_sos_eos

    vocab = 32
    rng = np.random.default_rng(0)
    labels = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    ys_in, ys_out = add_sos_eos(labels, vocab - 1, vocab - 1)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32)),
        "feat_lens": jnp.asarray([32, 24], jnp.int32),
        "labels": jnp.asarray(labels),
        "label_lens": jnp.asarray([3, 3], jnp.int32),
        "ys_in": jnp.asarray(ys_in.astype(np.int32)),
        "ys_out": jnp.asarray(ys_out.astype(np.int32)),
        "ys_lens": jnp.asarray([4, 4], jnp.int32),
    }

    def build(int8):
        return ASRModel(
            vocab_size=vocab, input_dim=16, d_model=32, head_num=2,
            ffn_dim=64, num_encoder_layers=1, num_decoder_layers=1,
            dtype=jnp.bfloat16, int8_ffn=int8,
        )

    return build, batch


class TestInt8TrainingMatmul:
    def test_forward_matches_f32(self):
        from mindaudio_tpu.ops.quant import int8_training_matmul

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 7, 256)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((256, 128)) * 0.05, jnp.float32)
        y = int8_training_matmul(x, w).astype(jnp.float32)
        ref = jnp.asarray(x, jnp.float32) @ w
        rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
        assert y.shape == (4, 7, 128)
        assert y.dtype == jnp.float32  # x was bf16 → output keeps x dtype
        assert rel < 0.02, rel

    def test_backward_is_straight_through_bf16(self):
        from mindaudio_tpu.ops.quant import int8_training_matmul

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((16, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((64, 32)) * 0.1, jnp.float32)
        g = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)

        # pull the VJP directly: with a FIXED cotangent, dx/dw must equal
        # the bf16 matmul gradients exactly (same contraction, same dtypes)
        _, vjp_i8 = jax.vjp(int8_training_matmul, x, w)
        _, vjp_bf = jax.vjp(
            lambda x, w: (jnp.asarray(x, jnp.bfloat16)
                          @ jnp.asarray(w, jnp.bfloat16)).astype(x.dtype), x, w)
        gb = g.astype(jnp.bfloat16)
        gx_i, gw_i = vjp_i8(gb)
        gx_b, gw_b = vjp_bf(gb)
        # mine accumulates in f32 (preferred_element_type); the auto-derived
        # bf16 vjp may round intermediates — bf16-resolution agreement
        np.testing.assert_allclose(np.asarray(gx_i, np.float32),
                                   np.asarray(gx_b, np.float32),
                                   rtol=1e-2, atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw_i, np.float32),
                                   np.asarray(gw_b, np.float32),
                                   rtol=1e-2, atol=1e-3)


class TestInt8Model:
    def test_checkpoint_compatible_params(self, model_and_batch):
        build, batch = model_and_batch
        p_bf = build(False).init(jax.random.PRNGKey(0), batch)["params"]
        p_i8 = build(True).init(jax.random.PRNGKey(0), batch)["params"]
        assert (jax.tree_util.tree_structure(p_bf)
                == jax.tree_util.tree_structure(p_i8))
        for a, b in zip(jax.tree_util.tree_leaves(p_bf),
                        jax.tree_util.tree_leaves(p_i8)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_loss_close_and_grads_finite(self, model_and_batch):
        build, batch = model_and_batch
        m_bf, m_i8 = build(False), build(True)
        params = m_bf.init(jax.random.PRNGKey(0), batch)["params"]
        l_bf = float(m_bf.apply({"params": params}, batch)[0])
        l_i8 = float(m_i8.apply({"params": params}, batch)[0])
        assert abs(l_bf - l_i8) / abs(l_bf) < 0.05, (l_bf, l_i8)
        grads = jax.grad(
            lambda p: m_i8.apply({"params": p}, batch)[0])(params)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf, np.float32)).all()

    def test_int8_model_trains(self, model_and_batch):
        import optax

        build, batch = model_and_batch
        m = build(True)
        params = m.init(jax.random.PRNGKey(0), batch)["params"]
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            loss, grads = jax.value_and_grad(
                lambda p: m.apply({"params": p}, batch)[0])(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        losses = []
        for _ in range(8):
            params, opt, loss = step(params, opt)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses