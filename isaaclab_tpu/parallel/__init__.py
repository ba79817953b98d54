"""SPMD scaling over a device mesh (SURVEY.md §2.10 parallelism inventory).

The reference's only distributed strategy is data parallelism: one simulator
replica per GPU, NCCL gradient all-reduce (docs multi_gpu.rst:24). The
TPU-native equivalent is one jitted SPMD program: env state sharded over the
mesh ``data`` axis, learner replicated, gradient/metric reductions lowered by
XLA to ICI collectives — no process-group code (SURVEY.md §5 backend note).
"""

from .mesh import (  # noqa: F401
    DATA_AXIS,
    initialize_distributed,
    make_mesh,
    replicate,
    shard_batch,
    shard_env_pytree,
)
