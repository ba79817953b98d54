"""Shared env types (reference ``envs/common.py``).

``VecEnvObs`` = dict[str, array | dict]; ``VecEnvStepReturn`` =
(obs, reward, terminated, truncated, extras) — same 5-tuple contract as the
reference (common.py:76-99), with jax arrays instead of torch tensors.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

VecEnvObs = Dict[str, Any]
VecEnvStepReturn = Tuple[VecEnvObs, jax.Array, jax.Array, jax.Array, dict]

# MARL aliases (reference common.py:111-134)
AgentID = str
ObsType = Any
ActionType = Any
StateType = Any
EnvStepReturn = Tuple[
    Dict[AgentID, ObsType],
    Dict[AgentID, jax.Array],
    Dict[AgentID, jax.Array],
    Dict[AgentID, jax.Array],
    dict,
]
