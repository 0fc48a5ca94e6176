"""Device-mesh / sharding utilities — the distributed layer.

Replaces the reference's HCCL/NCCL + ``DistributedGradReducer`` stack
(SURVEY §2.6): no rank tables, no mpirun — a ``jax.sharding.Mesh`` with named
axes and GSPMD-inserted collectives over ICI/DCN.
"""

from .mesh import (  # noqa: F401
    barrier,
    batch_sharding,
    get_device_id,
    get_device_num,
    get_rank_id,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
)
from .moe import MoEFeedForward, moe_capacity  # noqa: F401
from .pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_spmd,
    stack_layer_params,
)
from .ring_attention import (  # noqa: F401
    ring_attention,
    sequence_parallel_attention,
    ulysses_attention,
)
from .shardings import CONFORMER_TP_RULES, infer_shardings, state_shardings  # noqa: F401
