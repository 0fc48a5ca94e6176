"""Mixture-of-Experts FFN with expert parallelism (EP).

New capability beyond the reference (SURVEY §2.6: the reference is
data-parallel only; it has no MoE models). This is the TPU-native EP recipe:

- **Token-choice top-k routing with a static capacity** (Switch/GShard
  style): every shape is static under ``jit`` — tokens past an expert's
  capacity are *dropped* (their MoE output is zero; the surrounding residual
  connection carries them through unchanged), so XLA never sees a
  data-dependent shape.
- **Experts live on a mesh axis** (``expert_axis``, by default the ``model``
  axis — the standard Megatron-style layout where EP rides the tensor-model
  axis): the expert-stacked weights ``(E, D, H)`` and the dispatched token
  blocks ``(E, C, D)`` are sharded ``P(expert_axis)``, and the
  dispatch/combine einsums run under GSPMD sharding constraints, so XLA
  inserts the all_to_all collectives over ICI — no hand-written comms.
- Routing runs in float32 (softmax over expert logits needs the range);
  expert compute runs in the module dtype (bf16 on the MXU).

The load-balancing auxiliary loss (Switch Transformers eq. 4:
``E * Σ_e f_e · P_e``, minimized at uniform routing) is sowed under
``intermediates/moe_aux_loss`` so any trainer can pull it out with
``mutable=["intermediates"]`` and add ``aux_weight * aux`` to its loss.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["MoEFeedForward", "moe_capacity"]


def moe_capacity(n_tokens: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Static per-expert capacity: ``factor * k * S / E``, rounded up to a
    multiple of 8 (VPU sublane) and at least 8."""
    cap = int(capacity_factor * top_k * n_tokens / num_experts + 0.999)
    return max(8, (cap + 7) // 8 * 8)


class MoEFeedForward(nn.Module):
    """Drop-in MoE replacement for ``PositionwiseFeedForward``.

    Args:
        num_experts: E, the expert count. Shard over ``expert_axis`` when a
            mesh is given (E must be a multiple of the axis size).
        hidden_units: per-expert FFN hidden width.
        top_k: experts per token (1 = Switch, 2 = GShard default).
        capacity_factor: slack over the perfectly-balanced per-expert load.
        mesh: optional ``Mesh`` for EP sharding constraints; ``None`` runs
            the identical math unsharded (single device / GSPMD-free).
        expert_axis: mesh axis the expert dim is sharded over.
    """

    num_experts: int
    hidden_units: int
    dropout_rate: float = 0.1
    top_k: int = 2
    capacity_factor: float = 1.25
    activation: Callable = jax.nn.relu
    dtype: jnp.dtype = jnp.float32
    mesh: Optional[Mesh] = None
    expert_axis: str = "model"

    def _ep(self, x):
        """Constrain the leading expert dim onto the expert axis."""
        if self.mesh is None or self.mesh.shape.get(self.expert_axis, 1) <= 1:
            return x
        spec = P(self.expert_axis, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    @nn.compact
    def __call__(self, x, deterministic=True, mask_pad=None):
        """Apply the MoE FFN.

        Args:
            x: ``(B, T, D)`` tokens.
            mask_pad: optional ``(B, T)`` bool, True at VALID positions.
                Padded tokens are excluded from routing: they consume no
                expert capacity (audio batches are heavily padded — without
                this, pad frames evict real tokens via the cumsum priority),
                contribute nothing to the load-balance statistics, and get a
                zero MoE output (the surrounding residual carries them).
        """
        from mindaudio_tpu.models.layers import FastDropout

        B, T, D = x.shape
        E, K, H = self.num_experts, self.top_k, self.hidden_units
        if K > E:
            raise ValueError(
                f"top_k={K} exceeds num_experts={E}: each token can select "
                "an expert at most once")
        S = B * T
        C = moe_capacity(S, E, K, self.capacity_factor)

        gate_w = self.param("gate", nn.initializers.lecun_normal(),
                            (D, E), jnp.float32)
        w1 = self._ep(self.param("w1", nn.initializers.lecun_normal(),
                                 (E, D, H), jnp.float32).astype(self.dtype))
        b1 = self._ep(self.param("b1", nn.initializers.zeros,
                                 (E, H), jnp.float32).astype(self.dtype))
        w2 = self._ep(self.param("w2", nn.initializers.lecun_normal(),
                                 (E, H, D), jnp.float32).astype(self.dtype))
        b2 = self._ep(self.param("b2", nn.initializers.zeros,
                                 (E, D), jnp.float32).astype(self.dtype))

        xs = x.reshape(S, D)
        probs = jax.nn.softmax(
            jnp.asarray(xs, jnp.float32) @ gate_w, axis=-1)  # (S, E)
        valid = (jnp.ones((S, 1), jnp.float32) if mask_pad is None
                 else mask_pad.reshape(S, 1).astype(jnp.float32))

        # top-k one-hot selections, highest prob first; padded tokens are
        # masked out of every selection so they never dispatch or consume
        # capacity
        remaining = probs
        sel = []
        for _ in range(K):
            one = jax.nn.one_hot(jnp.argmax(remaining, -1), E,
                                 dtype=jnp.float32) * valid
            sel.append(one)
            remaining = remaining * (1.0 - one)
        sel_mask = sum(sel)  # (S, E), K ones per valid row

        # combine weights: selected probs renormalized over the top-k
        gk = probs * sel_mask
        gk = gk / jnp.maximum(gk.sum(-1, keepdims=True), 1e-9)

        # capacity assignment, GShard priority: k-level major, token order
        # minor — pos_in_expert counts earlier same-expert assignments
        counts = jnp.zeros((E,), jnp.float32)
        dispatch = jnp.zeros((S, E, C), jnp.float32)
        for one in sel:
            pos = jnp.cumsum(one, axis=0) - one + counts  # (S, E)
            keep = one * (pos < C)
            # one_hot is all-zero for positions outside [0, C); pos is
            # exact integer-valued, cast for int-typed one_hot
            dispatch = dispatch + keep[:, :, None] * jax.nn.one_hot(
                pos.astype(jnp.int32), C, dtype=jnp.float32)
            counts = counts + keep.sum(0)
        combine = dispatch * gk[:, :, None]  # (S, E, C)

        # dispatch → expert FFN → combine (XLA turns the sharded einsums
        # into all_to_all over the expert axis)
        expert_in = self._ep(jnp.einsum(
            "sec,sd->ecd", dispatch.astype(self.dtype), xs))
        h = self.activation(
            jnp.einsum("ecd,edh->ech", expert_in, w1) + b1[:, None, :])
        h = FastDropout(self.dropout_rate)(h, deterministic=deterministic)
        out = self._ep(
            jnp.einsum("ech,ehd->ecd", h, w2) + b2[:, None, :])
        y = jnp.einsum("sec,ecd->sd", combine.astype(self.dtype), out)

        # Switch load-balance loss: E * Σ_e (fraction routed to e) · (mean
        # gate prob of e); uses the k=0 (primary) assignment for f_e.
        # Statistics run over VALID tokens only — pad frames carry no
        # routing signal and would bias both factors toward their argmax.
        n_valid = jnp.maximum(valid.sum(), 1.0)
        f_e = sel[0].sum(0) / n_valid
        p_e = (probs * valid).sum(0) / n_valid
        self.sow("intermediates", "moe_aux_loss",
                 E * jnp.sum(f_e * p_e))

        return y.reshape(B, T, D)
