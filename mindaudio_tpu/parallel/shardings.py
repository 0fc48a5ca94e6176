"""Parameter/state sharding rules over the (data, model, seq) mesh.

The reference is data-parallel only (SURVEY §2.6): grads all-reduced by
``DistributedGradReducer``. On TPU we go further: besides DP over the ``data``
axis, large projection matrices are Megatron-sharded over the ``model`` axis —
column-parallel for the up-projections (FFN first Dense, attention q/k/v),
row-parallel for the down-projections (FFN second Dense, attention output) —
and GSPMD inserts the single all-reduce per block over ICI.

Rules are matched against the flattened parameter path (joined with ``/``), so
the same rule set applies to the optimizer state (optax mu/nu mirror the param
tree and therefore contain the same path segments).
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["CONFORMER_TP_RULES", "infer_shardings", "state_shardings"]

# (path regex, PartitionSpec) — first match wins. Column-parallel = shard the
# output (last) dim; row-parallel = shard the input (first) dim of the kernel.
CONFORMER_TP_RULES: Sequence[Tuple[str, P]] = (
    # attention projections
    (r"(linear_q|linear_k|linear_v|linear_pos)/kernel$", P(None, "model")),
    (r"(linear_q|linear_k|linear_v)/bias$", P("model")),
    (r"linear_out/kernel$", P("model", None)),
    # position-wise FFN: Dense_0 up-proj, Dense_1 down-proj
    (r"feed_forward(_macaron)?/Dense_0/kernel$", P(None, "model")),
    (r"feed_forward(_macaron)?/Dense_0/bias$", P("model")),
    (r"feed_forward(_macaron)?/Dense_1/kernel$", P("model", None)),
    # conformer conv module pointwise convs (Dense layers). Caveat: conv1's
    # 2C output feeds GLU(axis=-1), which pairs element i with C+i across
    # the contiguous column split, so GSPMD reshards inside the conv module
    # rather than running it purely block-local. The rules still stay:
    # test_shardings.py proves loss/grad equivalence WITH them, while
    # dropping them lets the partitioner pick activation shardings that
    # miscompute the depthwise-conv kernel grad by a factor of the model
    # axis size (observed 4x on the 8-device CPU mesh) — explicit param
    # shardings pin the partitioner to a correct (if chattier) program.
    (r"pointwise_conv1/kernel$", P(None, "model")),
    (r"pointwise_conv1/bias$", P("model")),
    (r"pointwise_conv2/kernel$", P("model", None)),
    # big output heads: shard the vocab dim
    (r"(output_layer|ctc_proj)/kernel$", P(None, "model")),
    (r"(output_layer|ctc_proj)/bias$", P("model")),
    # MoE expert-stacked params (parallel/moe.py): expert dim over the
    # model axis — EP for the STORED weights and their optimizer state, not
    # just the in-graph cast copy. The dense FFN path never has bare
    # w1/w2/b1/b2 children (its kernels live under Dense_0/Dense_1), so
    # these cannot over-match.
    (r"feed_forward/(w1|w2|b1|b2)$", P("model")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path_s: str, leaf, rules, model_size: int) -> P:
    if not hasattr(leaf, "shape") or leaf.ndim == 0:
        return P()
    for pat, spec in rules:
        if re.search(pat, path_s):
            # only shard when the annotated dim divides evenly
            ok = True
            for dim, axis in zip(leaf.shape, tuple(spec) + (None,) * leaf.ndim):
                if axis == "model" and dim % model_size != 0:
                    ok = False
            if ok and len(spec) <= leaf.ndim:
                return spec
            return P()
    return P()


def infer_shardings(tree, mesh: Mesh, rules=CONFORMER_TP_RULES):
    """NamedSharding pytree for ``tree`` by path-matching ``rules``.

    Unmatched leaves are replicated (pure DP). Works on params and on optax
    states whose inner trees mirror the params (mu/nu).
    """
    model_size = mesh.shape.get("model", 1)

    def leaf_sharding(path, leaf):
        spec = _spec_for(_path_str(path), leaf, rules, model_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def _zero1_spec(tp_spec: P, leaf, data_size: int, data_axis: str) -> P:
    """Extend a leaf's TP spec with the data axis on the first free dim.

    ZeRO-1 shards each optimizer-moment tensor over the ``data`` axis along
    the first dimension that (a) is not already taken by a tensor-parallel
    axis and (b) divides the data-axis size. Leaves with no such dim (odd
    shapes, scalars) keep their TP spec — correctness never depends on a
    leaf being sharded.
    """
    spec = list(tuple(tp_spec)) + [None] * (leaf.ndim - len(tuple(tp_spec)))
    for i, (dim, axis) in enumerate(zip(leaf.shape, spec)):
        if axis is None and dim % data_size == 0 and dim >= data_size:
            spec[i] = data_axis
            return P(*spec)
    return P(*spec)


def state_shardings(state, mesh: Mesh, rules=CONFORMER_TP_RULES,
                    zero1: bool = False, data_axis: str = "data"):
    """Shardings for a full TrainState (params + opt_state + scalars).

    ``zero1=True`` additionally shards the optimizer-state moment tensors
    (every float leaf under ``opt_state``) over the ``data`` mesh axis —
    ZeRO stage 1. With bf16-m/f32-v AdamW the optimizer state is ~2.5x the
    params and otherwise fully replicated across data-parallel devices; the
    AdamW update is elementwise, so GSPMD keeps the moment update local to
    each shard and inserts one all-gather of the (elementwise) param delta
    per step — the classic ZeRO-1 exchange. Params stay replicated, so the
    forward/backward and the loss trajectory are bit-identical to the
    replicated run (tests/test_zero1.py asserts this).

    New capability beyond the reference, which explicitly opts out of
    optimizer sharding (reference models/layers/layernorm.py:36
    ``parallel_optimizer=False``); SURVEY §2.6 ZeRO row.
    """
    if not zero1 or mesh.shape.get(data_axis, 1) <= 1:
        return infer_shardings(state, mesh, rules)

    model_size = mesh.shape.get("model", 1)
    data_size = mesh.shape[data_axis]

    def leaf_sharding(path, leaf):
        path_s = _path_str(path)
        spec = _spec_for(path_s, leaf, rules, model_size)
        if ("opt_state" in path_s.split("/")
                and hasattr(leaf, "dtype")
                and jax.numpy.issubdtype(leaf.dtype, jax.numpy.floating)
                and getattr(leaf, "ndim", 0) >= 1):
            spec = _zero1_spec(spec, leaf, data_size, data_axis)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)
