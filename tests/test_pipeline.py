"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over the
``pipe`` mesh axis must be numerically a no-op vs applying the layer stack
sequentially — forward AND gradients (the backward schedule falls out of AD
through the scanned ppermute pipeline).

New capability beyond the reference (SURVEY §2.6: data-parallel only).
Runs on the virtual 8-device CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mindaudio_tpu.parallel.mesh import make_mesh
from mindaudio_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_layer_params,
)

L, D = 8, 16


def _mlp_layer(p, h):
    # residual MLP block: h + tanh(h @ w + b) @ v
    return h + jnp.tanh(h @ p["w"] + p["b"]) @ p["v"]


def _stacked_mlp_params(rng, n_layers=L, d=D):
    keys = jax.random.split(rng, n_layers)
    per_layer = [
        {
            "w": jax.random.normal(k, (d, 2 * d), jnp.float32) / np.sqrt(d),
            "b": jnp.zeros((2 * d,), jnp.float32),
            "v": jax.random.normal(jax.random.fold_in(k, 1), (2 * d, d),
                                   jnp.float32) / np.sqrt(2 * d),
        }
        for k in keys
    ]
    return stack_layer_params(per_layer)


def _sequential(params, x):
    def body(h, p):
        return _mlp_layer(p, h), None

    h, _ = jax.lax.scan(body, x, params)
    return h


@pytest.mark.parametrize("mesh_shape,n_micro", [
    ((2, 4), 4),   # DP x PP
    ((1, 8), 8),   # pure PP, deepest pipeline
    ((8, 1), 2),   # degenerate single-stage pipeline
    ((2, 4), 8),   # more microbatches than stages
])
def test_pipeline_matches_sequential(mesh_shape, n_micro):
    data, pipe = mesh_shape
    mesh = make_mesh(data=data, pipe=pipe)
    params = _stacked_mlp_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 6, D), jnp.float32)

    want = _sequential(params, x)
    got = jax.jit(
        lambda p, x: pipeline_apply(_mlp_layer, p, x, mesh,
                                    num_microbatches=n_micro)
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential():
    mesh = make_mesh(data=2, pipe=4)
    params = _stacked_mlp_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 6, D), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (8, 6, D), jnp.float32)

    def loss_seq(p, x):
        return jnp.mean(jnp.square(_sequential(p, x) - tgt))

    def loss_pipe(p, x):
        out = pipeline_apply(_mlp_layer, p, x, mesh, num_microbatches=4)
        return jnp.mean(jnp.square(out - tgt))

    want_l, want_g = jax.value_and_grad(loss_seq)(params, x)
    got_l, got_g = jax.jit(jax.value_and_grad(loss_pipe))(params, x)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for (kw, gw), (kg, gg) in zip(
        sorted(want_g.items()), sorted(got_g.items())
    ):
        assert kw == kg
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=3e-5, atol=3e-5,
                                   err_msg=f"grad mismatch for {kw}")


def test_pipeline_conformer_blocks():
    """Pipeline a real Conformer encoder-layer stack (with mask + rel-pos
    extras) and compare against sequential application."""
    from mindaudio_tpu.models.conformer import ConformerEncoderLayer
    from mindaudio_tpu.models.layers import sinusoid_table

    d_model, t, b = 32, 12, 8
    layer = ConformerEncoderLayer(
        d_model=d_model, head_num=4, ffn_dim=64, kernel_size=7,
        dropout_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d_model), jnp.float32)
    mask = jnp.ones((b, 1, t), bool)
    pos_emb = jnp.asarray(sinusoid_table(t, d_model))[None]
    mask_pad = jnp.ones((b, t), bool)

    per_layer = [
        layer.init(jax.random.PRNGKey(i), x, mask, pos_emb, mask_pad)["params"]
        for i in range(4)
    ]
    stacked = stack_layer_params(per_layer)

    def layer_fn(p, h, mask, pos_emb, mask_pad):
        return layer.apply({"params": p}, h, mask, pos_emb, mask_pad)

    want = x
    for p in per_layer:
        want = layer_fn(p, want, mask, pos_emb, mask_pad)

    mesh = make_mesh(data=2, pipe=4)
    got = jax.jit(
        lambda sp, x: pipeline_apply(
            layer_fn, sp, x, mesh, num_microbatches=4,
            extras=(mask[:2], pos_emb, mask_pad[:2]), batch_axis=None,
        )
    )(stacked, x)
    # extras are replicated, so the per-microbatch mask rows must cover the
    # microbatch size (b / n_micro = 2): slice the equal-length masks.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_rejects_bad_splits():
    mesh = make_mesh(data=2, pipe=4)
    params = _stacked_mlp_params(jax.random.PRNGKey(0), n_layers=6)
    x = jnp.zeros((8, 4, D))
    with pytest.raises(ValueError, match="not divisible into"):
        pipeline_apply(_mlp_layer, params, x, mesh, num_microbatches=4)
    params = _stacked_mlp_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="not divisible by"):
        pipeline_apply(_mlp_layer, params, x, mesh, num_microbatches=3)
