"""Train state + data-parallel train step factory.

The reference's per-step machinery (loss-scaled forward/backward, overflow
check, grad clip, DistributedGradReducer all-reduce, conditional update —
reference utils/train_one_step.py:13-48) collapses on TPU to: value_and_grad
under jit with batch sharded over the ``data`` mesh axis. GSPMD inserts the
gradient ``psum``; bf16 keeps activations cheap while f32 master params make
loss scaling unnecessary (optional grad clipping kept).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state

__all__ = ["TrainState", "make_train_step", "clip_by_global_norm",
           "skip_nonfinite_update", "fast_dropout_rng", "as_dropout_key"]


def fast_dropout_rng(seed: int):
    """Dropout rng for a TrainState, on the fastest PRNG for this backend.

    JAX's default threefry2x32 PRNG is computed in software on TPU —
    measured ~23 ms of a 45 ms flagship conformer step went to generating
    dropout masks alone (PERF.md). On TPU this returns key *data* for the
    ``rbg`` implementation, which drives the hardware RngBitGenerator
    (~1.7x whole-step speedup); elsewhere it keeps the default threefry
    (bit-reproducible tests). Raw uint32 data — not a typed key — so the
    TrainState stays a plain-array pytree that orbax serializes; wrap with
    :func:`as_dropout_key` before use. ``rbg`` trades bit-exact
    reproducibility across backends/versions for speed — fine for dropout/
    dither/SpecAugment masks, wrong for anything needing stable streams.
    """
    if jax.default_backend() == "tpu":
        return jax.random.key_data(jax.random.key(seed, impl="rbg"))
    return jax.random.PRNGKey(seed)


def as_dropout_key(rng):
    """Raw key data (or legacy/typed key) → typed key, impl from the shape.

    ``(4,)`` uint32 is rbg key data (:func:`fast_dropout_rng` on TPU);
    ``(2,)`` uint32 is legacy threefry data; typed keys pass through.
    """
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return rng
    if rng.shape[-1:] == (4,):
        return jax.random.wrap_key_data(rng, impl="rbg")
    return jax.random.wrap_key_data(rng, impl="threefry2x32")


class TrainState(flax_train_state.TrainState):
    """flax TrainState + mutable batch stats (BatchNorm models) + rng key."""

    batch_stats: Any = None
    dropout_rng: Any = None


def create_train_state(model, params, tx, batch_stats=None, dropout_rng=None):
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        batch_stats=batch_stats,
        dropout_rng=dropout_rng,
    )


def clip_by_global_norm(grads, max_norm):
    """Scale ``grads`` so their global norm is at most ``max_norm``.

    Returns ``(clipped_grads, global_norm)``. A non-finite norm zeroes the
    scale instead of propagating ``clip / inf = 0`` times an inf grad as a
    silent NaN — but ``0 * inf`` is still NaN on the overflowed leaves, so
    callers must pair this with ``skip_nonfinite_update(..., grads=grads)``
    (the reference's gradient-overflow skip, utils/train_one_step.py:44-46).
    """
    gnorm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    scale = jnp.where(jnp.isfinite(scale), scale, 0.0)
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm


def skip_nonfinite_update(old_state, new_state, loss, grads=None):
    """Keep the old state when loss/grads went non-finite.

    The bf16 counterpart of the reference's loss-scale overflow skip
    (reference utils/train_one_step.py:44-46, which checks ``FloatStatus``
    over the *gradients*): no dynamic scaling is needed with f32 params, but
    a rare inf/nan batch shouldn't poison the weights. A finite loss does
    not imply finite grads (backward-only overflow), so when ``grads`` is
    given every leaf is checked too.
    """
    ok = jnp.isfinite(loss)
    if grads is not None:
        leaves_ok = [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
        if leaves_ok:
            ok = jnp.logical_and(ok, jnp.stack(leaves_ok).all())
    merged = jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new_state, old_state
    )
    # a skipped batch still consumes a step (like the reference, where the
    # overflow branch returns without calling the optimizer but Model.train's
    # step count advances): the LR schedule and per-step rng folds stay
    # aligned with data consumption
    if hasattr(merged, "step") and hasattr(merged, "replace"):
        merged = merged.replace(step=new_state.step)
    return merged


def make_train_step(
    loss_fn: Callable,
    mesh=None,
    grad_clip_norm: Optional[float] = None,
    has_batch_stats: bool = False,
    donate: bool = True,
    skip_nonfinite: bool = True,
):
    """Build a jitted (optionally mesh-sharded) train step.

    Args:
        loss_fn: ``loss_fn(params, state, batch, rng) -> (loss, aux)`` where
            ``aux`` is a dict; when ``has_batch_stats`` it must contain
            ``"batch_stats"`` (the updated mutable collection).
        mesh: optional ``Mesh``; batch axis 0 is sharded over ``data`` and the
            state replicated — GSPMD then emits the gradient all-reduce.
        grad_clip_norm: optional global-norm clipping (the reference clips in
            train_one_step.py:35).

    Returns:
        ``step(state, batch) -> (state, metrics)``.
    """

    def step(state, batch):
        rng = None
        if state.dropout_rng is not None:
            rng = jax.random.fold_in(
                as_dropout_key(state.dropout_rng), state.step)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn(state.params, state, batch, rng)

        if grad_clip_norm is not None:
            grads, gnorm = clip_by_global_norm(grads, grad_clip_norm)
            aux = dict(aux, grad_norm=gnorm)

        new_state = state.apply_gradients(grads=grads)
        if has_batch_stats and "batch_stats" in aux:
            new_state = new_state.replace(batch_stats=aux.pop("batch_stats"))
        if skip_nonfinite:
            new_state = skip_nonfinite_update(state, new_state, loss, grads=grads)
        metrics = dict(aux, loss=loss)
        return new_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data_sh),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())
