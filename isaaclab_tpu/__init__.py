"""isaaclab_tpu — a TPU-native robot-learning framework.

A from-scratch rebuild of the capabilities of Isaac Lab (reference at
/root/reference) designed for TPU: a batched JAX/Pallas rigid-body physics
engine (Featherstone articulation dynamics + iterative contact solver),
pure-functional MDP managers composed into a single jitted env step, on-device
PPO with ``lax.scan`` rollouts, and SPMD scaling over ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU MXU matmuls default to bfloat16 inputs; dynamics algorithms (mass
# matrices, Jacobians, contact Delassus operators) need f32 accuracy —
# a 2e-3 relative error destabilizes the constraint solver. Neural-net code
# opts into bf16 explicitly where it wants speed.
_jax.config.update("jax_default_matmul_precision", "highest")
