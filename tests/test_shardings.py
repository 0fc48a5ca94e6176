"""Tensor-parallel sharding rules: spec inference + numerical equivalence.

Proves the Megatron rules (parallel/shardings.py) give the same loss and
gradients as unsharded execution — GSPMD only changes the partitioning.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def setup():
    from mindaudio_tpu.models.asr_model import ASRModel
    from mindaudio_tpu.utils.common import add_sos_eos

    vocab = 32
    model = ASRModel(
        vocab_size=vocab, input_dim=16, d_model=32, head_num=2, ffn_dim=64,
        num_encoder_layers=1, num_decoder_layers=1,
    )
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
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    return model, params, batch


class TestTPShardings:
    def test_rules_match_expected_specs(self, setup):
        from mindaudio_tpu.parallel.mesh import make_mesh
        from mindaudio_tpu.parallel.shardings import infer_shardings

        model, params, _ = setup
        mesh = make_mesh(data=4, model=2)
        sh = infer_shardings(params, mesh)
        flat = {
            "/".join(str(getattr(k, "key", k)) for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
        }
        ffn_up = [k for k in flat if "feed_forward" in k and "Dense_0/kernel" in k]
        assert ffn_up and all(flat[k] == P(None, "model") for k in ffn_up)
        ffn_down = [k for k in flat if "feed_forward" in k and "Dense_1/kernel" in k]
        assert ffn_down and all(flat[k] == P("model", None) for k in ffn_down)
        q = [k for k in flat if k.endswith("linear_q/kernel")]
        assert q and all(flat[k] == P(None, "model") for k in q)
        # layernorm scales replicated
        ln = [k for k in flat if "norm" in k and k.endswith("scale")]
        assert ln and all(flat[k] == P() for k in ln)

    def test_tp_loss_and_grads_match_unsharded(self, setup):
        from mindaudio_tpu.parallel.mesh import make_mesh
        from mindaudio_tpu.parallel.shardings import infer_shardings

        model, params, batch = setup

        def loss_fn(p, b):
            loss, _ = model.apply({"params": p}, b)
            return loss

        ref_loss = float(jax.jit(loss_fn)(params, batch))
        ref_grads = jax.grad(loss_fn)(params, batch)

        mesh = make_mesh(data=2, model=4)
        p_sh = infer_shardings(params, mesh)
        data_sh = NamedSharding(mesh, P("data"))
        sharded_params = jax.device_put(params, p_sh)
        sharded_batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data_sh), batch
        )
        tp_loss_fn = jax.jit(loss_fn, in_shardings=(p_sh, data_sh))
        tp_loss = float(tp_loss_fn(sharded_params, sharded_batch))
        assert tp_loss == pytest.approx(ref_loss, rel=1e-5)

        tp_grads = jax.jit(jax.grad(loss_fn), in_shardings=(p_sh, data_sh),
                           out_shardings=p_sh)(sharded_params, sharded_batch)
        for a, b in zip(jax.tree_util.tree_leaves(ref_grads),
                        jax.tree_util.tree_leaves(tp_grads)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)
