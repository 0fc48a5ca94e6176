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


def state_shardings(state, mesh: Mesh, rules=CONFORMER_TP_RULES):
    """Shardings for a full TrainState (params + opt_state + scalars)."""
    return infer_shardings(state, mesh, rules)
