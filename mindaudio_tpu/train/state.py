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

__all__ = ["TrainState", "make_train_step"]


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
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), new_state, old_state
    )


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
            rng = jax.random.fold_in(state.dropout_rng, state.step)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn(state.params, state, batch, rng)

        if grad_clip_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip_norm / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
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
