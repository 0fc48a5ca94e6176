"""ZeRO-1 optimizer-state sharding (parallel/shardings.py state_shardings).

Two claims, both proven on the virtual 8-device CPU mesh:

1. Sharding the AdamW moments over the ``data`` axis does not change the
   training trajectory at all — params stay replicated, the update is
   elementwise, so losses and params bit-match the replicated run.
2. The per-device optimizer-state footprint actually drops by the data-axis
   size (8x here) for every shardable moment tensor.

New capability beyond the reference (SURVEY §2.6: the one missing matrix
row; reference models/layers/layernorm.py:36 pins parallel_optimizer=False).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def setup():
    from mindaudio_tpu.models.asr_model import ASRModel
    from mindaudio_tpu.train.state import TrainState
    from mindaudio_tpu.utils.common import add_sos_eos

    vocab = 32
    model = ASRModel(
        vocab_size=vocab, input_dim=16, d_model=32, head_num=2, ffn_dim=64,
        num_encoder_layers=1, num_decoder_layers=1,
    )
    rng = np.random.default_rng(0)
    labels = np.tile(np.array([[1, 2, 3], [4, 5, 6]], np.int32), (4, 1))
    ys_in, ys_out = add_sos_eos(labels, vocab - 1, vocab - 1)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((8, 32, 16)).astype(np.float32)),
        "feat_lens": jnp.asarray([32, 24] * 4, jnp.int32),
        "labels": jnp.asarray(labels),
        "label_lens": jnp.full((8,), 3, jnp.int32),
        "ys_in": jnp.asarray(ys_in.astype(np.int32)),
        "ys_out": jnp.asarray(ys_out.astype(np.int32)),
        "ys_lens": jnp.full((8,), 4, jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch)["params"]

    def make_state():
        return TrainState.create(
            apply_fn=model.apply, params=params,
            tx=optax.adamw(1e-3, weight_decay=1e-2, mu_dtype=jnp.bfloat16),
        )

    def loss_fn(p, b):
        loss, _ = model.apply({"params": p}, b)
        return loss

    def step(state, b):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, b)
        return state.apply_gradients(grads=grads), loss

    return make_state, step, batch


def _run(step, state, batch, mesh, st_sh, n=3):
    data_sh = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, st_sh)
    b = jax.tree_util.tree_map(lambda x: jax.device_put(x, data_sh), batch)
    fn = jax.jit(step, in_shardings=(st_sh, data_sh),
                 out_shardings=(st_sh, NamedSharding(mesh, P())))
    losses = []
    for _ in range(n):
        state, loss = fn(state, b)
        losses.append(float(loss))
    return state, losses


def _opt_bytes_per_device(state):
    total = 0
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        if hasattr(leaf, "sharding") and getattr(leaf, "ndim", 0) >= 1:
            shard_shape = leaf.sharding.shard_shape(leaf.shape)
            total += int(np.prod(shard_shape)) * leaf.dtype.itemsize
    return total


class TestZero1:
    def test_specs_shard_moments_only(self, setup):
        from mindaudio_tpu.parallel.mesh import make_mesh
        from mindaudio_tpu.parallel.shardings import state_shardings

        make_state, _, _ = setup
        state = make_state()
        mesh = make_mesh(data=8)
        sh = state_shardings(state, mesh, zero1=True)
        # params never sharded over data (TP specs on the size-1 model axis
        # are effectively replicated)
        for s in jax.tree_util.tree_leaves(sh.params):
            assert "data" not in str(s.spec), s.spec
        # moment kernels sharded over data
        flat = {
            "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                     for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(sh.opt_state)[0]
        }
        kernels = [k for k in flat if k.endswith("kernel")]
        assert kernels
        sharded = [k for k in kernels if "data" in str(flat[k])]
        # every 2-D kernel moment has at least one dim divisible by 8 here
        assert len(sharded) >= len(kernels) * 0.8, (len(sharded), len(kernels))

    def test_trajectory_bitmatches_and_memory_drops(self, setup):
        from mindaudio_tpu.parallel.mesh import make_mesh
        from mindaudio_tpu.parallel.shardings import state_shardings

        make_state, step, batch = setup
        mesh = make_mesh(data=8)

        state_a, state_b = make_state(), make_state()
        repl_sh = state_shardings(state_a, mesh, zero1=False)
        z1_sh = state_shardings(state_b, mesh, zero1=True)

        s_repl, l_repl = _run(step, state_a, batch, mesh, repl_sh)
        s_z1, l_z1 = _run(step, state_b, batch, mesh, z1_sh)

        # (i) loss trajectory bit-matches the replicated run
        assert l_repl == l_z1, (l_repl, l_z1)
        p_a = jax.device_get(s_repl.params)
        p_b = jax.device_get(s_z1.params)
        for a, b in zip(jax.tree_util.tree_leaves(p_a),
                        jax.tree_util.tree_leaves(p_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # (ii) per-device optimizer bytes drop ~8x on the 8-device mesh
        by_repl = _opt_bytes_per_device(s_repl)
        by_z1 = _opt_bytes_per_device(s_z1)
        assert by_z1 < by_repl / 6, (by_z1, by_repl)

    def test_zero1_composes_with_tp(self, setup):
        from mindaudio_tpu.parallel.mesh import make_mesh
        from mindaudio_tpu.parallel.shardings import state_shardings

        make_state, step, batch = setup
        mesh = make_mesh(data=4, model=2)

        state_a, state_b = make_state(), make_state()
        repl_sh = state_shardings(state_a, mesh, zero1=False)
        z1_sh = state_shardings(state_b, mesh, zero1=True)
        s_repl, l_repl = _run(step, state_a, batch, mesh, repl_sh)
        s_z1, l_z1 = _run(step, state_b, batch, mesh, z1_sh)
        np.testing.assert_allclose(l_repl, l_z1, rtol=1e-6)

        # TP-sharded moment kernels gain a data dim on their free axis
        flat = {
            "/".join(str(getattr(k, "key", getattr(k, "name", k)))
                     for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(
                z1_sh.opt_state)[0]
        }
        ffn_up = [v for k, v in flat.items()
                  if "feed_forward/Dense_0/kernel" in k]
        assert ffn_up and all(v == P("data", "model") for v in ffn_up), ffn_up
