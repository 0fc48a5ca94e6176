"""Ring attention vs dense reference on the virtual 8-device mesh — the
multi-device test the reference never had (SURVEY §4: no distributed tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def dense_attention(q, k, v, kv_valid=None):
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q * d**-0.5, k).astype(jnp.float32)
    if kv_valid is not None:
        s = jnp.where(kv_valid[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


@pytest.fixture(scope="module")
def mesh():
    from mindaudio_tpu.parallel.mesh import make_mesh

    return make_mesh(data=2, seq=4)


class TestRingAttention:
    def _rand(self, b=2, h=2, t=64, d=16, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        return mk(), mk(), mk()

    def test_matches_dense(self, mesh):
        from mindaudio_tpu.parallel.ring_attention import sequence_parallel_attention

        q, k, v = self._rand()
        out = sequence_parallel_attention(q, k, v, mesh)
        ref = dense_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_dense_with_padding(self, mesh):
        from mindaudio_tpu.parallel.ring_attention import sequence_parallel_attention

        q, k, v = self._rand(seed=1)
        b, _, t, _ = q.shape
        lens = np.array([40, 64])
        kv_valid = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
        out = sequence_parallel_attention(q, k, v, mesh, kv_valid=kv_valid)
        ref = dense_attention(q, k, v, kv_valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_jit_grad(self, mesh):
        """Differentiates and jits — usable inside a training step."""
        from mindaudio_tpu.parallel.ring_attention import sequence_parallel_attention

        q, k, v = self._rand(t=32, seed=2)

        @jax.jit
        def loss(q, k, v):
            return sequence_parallel_attention(q, k, v, mesh).sum()

        g = jax.grad(loss)(q, k, v)
        assert np.isfinite(np.asarray(g)).all()

        def dense_loss(q, k, v):
            return dense_attention(q, k, v).sum()

        g_ref = jax.grad(dense_loss)(q, k, v)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)


class TestUlyssesAttention:
    """Ulysses all-to-all variant vs dense reference (needs H % seq == 0)."""

    def _rand(self, b=2, h=4, t=64, d=16, seed=3):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
        return mk(), mk(), mk()

    def test_matches_dense(self, mesh):
        from mindaudio_tpu.parallel.ring_attention import sequence_parallel_attention

        q, k, v = self._rand()
        out = sequence_parallel_attention(q, k, v, mesh, variant="ulysses")
        ref = dense_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_ring_with_padding(self, mesh):
        from mindaudio_tpu.parallel.ring_attention import sequence_parallel_attention

        q, k, v = self._rand(seed=4)
        b, _, t, _ = q.shape
        lens = np.array([48, 64])
        kv_valid = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
        out_u = sequence_parallel_attention(q, k, v, mesh, kv_valid=kv_valid,
                                            variant="ulysses")
        out_r = sequence_parallel_attention(q, k, v, mesh, kv_valid=kv_valid,
                                            variant="ring")
        ref = dense_attention(q, k, v, kv_valid)
        np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_r),
                                   rtol=2e-5, atol=2e-5)

    def test_head_count_must_divide(self, mesh):
        from mindaudio_tpu.parallel.ring_attention import sequence_parallel_attention

        q, k, v = self._rand(h=2)  # 2 heads over seq=4
        with pytest.raises(Exception):
            jax.block_until_ready(
                sequence_parallel_attention(q, k, v, mesh, variant="ulysses"))

    def test_jit_grad(self, mesh):
        from mindaudio_tpu.parallel.ring_attention import sequence_parallel_attention

        q, k, v = self._rand(t=32, seed=5)

        @jax.jit
        def loss(q, k, v):
            return sequence_parallel_attention(q, k, v, mesh,
                                               variant="ulysses").sum()

        g = jax.grad(loss)(q, k, v)
        assert np.isfinite(np.asarray(g)).all()
