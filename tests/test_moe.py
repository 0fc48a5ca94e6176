"""Mixture-of-Experts FFN with expert parallelism (parallel/moe.py).

New capability beyond the reference (SURVEY §2.6: data-parallel only, no MoE
models). Invariants tested:

- identical experts + ample capacity ≡ the dense FFN (routing is then a
  weighted average of equal outputs, and the top-k gates renormalize to 1);
- capacity overflow *drops* tokens (zero MoE output — the residual carries
  them), never produces NaN or shape changes;
- EP-sharded execution over the ``model`` mesh axis is numerically the
  unsharded computation;
- gradients flow and the Switch load-balance aux loss is sowed.

Runs on the virtual 8-device CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindaudio_tpu.parallel.mesh import make_mesh
from mindaudio_tpu.parallel.moe import MoEFeedForward, moe_capacity

B, T, D, H = 2, 12, 16, 32


def _input(seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, T, D), jnp.float32)


def _dense_ffn(params, x, act=jax.nn.relu):
    """The dense two-layer FFN all experts are set to in the equality test."""
    h = act(x @ params["w1"] + params["b1"])
    return h @ params["w2"] + params["b2"]


def _tie_experts(variables):
    """Overwrite every expert's weights with expert 0's; return (vars, dense)."""
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    dense = {}
    for k in ("w1", "b1", "w2", "b2"):
        tied = np.broadcast_to(p[k][:1], p[k].shape).copy()
        p[k] = jnp.asarray(tied)
        dense[k] = jnp.asarray(tied[0])
    return {"params": p}, dense


@pytest.mark.parametrize("top_k", [1, 2])
def test_identical_experts_match_dense(top_k):
    moe = MoEFeedForward(num_experts=4, hidden_units=H, dropout_rate=0.0,
                         top_k=top_k, capacity_factor=4.0 / top_k)
    x = _input()
    variables = moe.init(jax.random.PRNGKey(1), x)
    tied, dense_p = _tie_experts(variables)
    got = moe.apply(tied, x)
    want = _dense_ffn(dense_p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_single_expert_is_dense():
    moe = MoEFeedForward(num_experts=1, hidden_units=H, dropout_rate=0.0,
                         top_k=1, capacity_factor=1.0)
    x = _input()
    # capacity must cover every token for E=1
    assert moe_capacity(B * T, 1, 1, 1.0) >= B * T
    variables = moe.init(jax.random.PRNGKey(1), x)
    p = variables["params"]
    got = moe.apply(variables, x)
    want = _dense_ffn({k: p[k][0] for k in ("w1", "b1", "w2", "b2")}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_capacity_overflow_drops_tokens():
    """Force all tokens onto expert 0 with capacity C < S: exactly the
    first C tokens (GShard order-priority) survive, the rest output 0."""
    moe = MoEFeedForward(num_experts=2, hidden_units=H, dropout_rate=0.0,
                         top_k=1, capacity_factor=0.5)
    # all-positive features so x @ gate (col 0 = 1e3) always favors expert 0
    x = jnp.abs(_input()) + 0.1
    variables = moe.init(jax.random.PRNGKey(1), x)
    p = dict(variables["params"])
    gate = np.zeros((D, 2), np.float32)
    gate[:, 0] = 1.0  # softmax(x @ gate) routes every token to expert 0
    p["gate"] = jnp.asarray(gate * 1e3)
    y = np.asarray(moe.apply({"params": p}, x)).reshape(-1, D)

    C = moe_capacity(B * T, 2, 1, 0.5)
    assert C < B * T
    assert np.isfinite(y).all()
    np.testing.assert_array_equal(y[C:], 0.0)  # dropped rows are exactly 0
    assert np.abs(y[:C]).max() > 0  # kept rows got expert output


def test_ep_sharded_matches_unsharded():
    mesh = make_mesh(data=2, model=4)
    x = _input()
    kwargs = dict(num_experts=4, hidden_units=H, dropout_rate=0.0,
                  top_k=2, capacity_factor=2.0)
    moe = MoEFeedForward(**kwargs)
    moe_ep = MoEFeedForward(**kwargs, mesh=mesh, expert_axis="model")
    variables = moe.init(jax.random.PRNGKey(1), x)
    want = jax.jit(lambda v, x: moe.apply(v, x))(variables, x)
    got = jax.jit(lambda v, x: moe_ep.apply(v, x))(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grads_and_aux_loss():
    mesh = make_mesh(data=2, model=4)
    moe = MoEFeedForward(num_experts=4, hidden_units=H, dropout_rate=0.0,
                         top_k=2, capacity_factor=2.0, mesh=mesh)
    x = _input()
    variables = moe.init(jax.random.PRNGKey(1), x)

    def loss(params, x):
        y, inter = moe.apply({"params": params}, x,
                             mutable=["intermediates"])
        aux = inter["intermediates"]["moe_aux_loss"][0]
        return jnp.mean(jnp.square(y)) + 0.01 * aux, aux

    (val, aux), grads = jax.jit(jax.value_and_grad(loss, has_aux=True))(
        variables["params"], x)
    assert np.isfinite(float(val)) and np.isfinite(float(aux))
    # perfectly balanced routing gives aux = 1; any routing stays near it
    assert 0.5 < float(aux) < 4.0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    # expert weights receive gradient (routing reached the experts)
    assert float(jnp.abs(grads["w1"]).sum()) > 0


def test_conformer_encoder_with_moe_blocks():
    from mindaudio_tpu.models.conformer import ConformerEncoder

    mesh = make_mesh(data=2, model=4)
    enc = ConformerEncoder(input_dim=8, d_model=16, head_num=2, ffn_dim=H,
                           num_layers=2, kernel_size=7, dropout_rate=0.0,
                           moe_experts=4, moe_top_k=2, moe_mesh=mesh)
    t_in = 31
    xs = jax.random.normal(jax.random.PRNGKey(0), (2, t_in, 8), jnp.float32)
    xs_lens = jnp.asarray([t_in, t_in - 8], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(1), xs, xs_lens)

    @jax.jit
    def loss(params):
        out, mask = enc.apply({"params": params}, xs, xs_lens)
        return (jnp.square(out) * mask[:, 0, :, None]).sum()

    val, grads = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(g))
               for g in jax.tree_util.tree_leaves(grads))
    # every block's final FFN is the MoE layer
    for i in range(2):
        assert "w1" in variables["params"][f"layer_{i}"]["feed_forward"]
