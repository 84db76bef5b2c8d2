"""Concrete environment state pytree.

Drop-in satisfier of the :class:`nnx_ppo_tpu.algorithms.types.EnvState`
protocol, shaped like ``mujoco_playground.State`` (the reference's env
substrate): ``data / obs / reward / done / info / metrics`` + ``replace``.
"""

from __future__ import annotations

from typing import Any

import jax

from nnx_ppo_tpu.core.struct import pytree_dataclass


@pytree_dataclass
class State:
    """Environment state. ``data`` holds the env's internal physics /
    simulation state; ``obs``/``reward`` may be arbitrary pytrees."""

    data: Any
    obs: Any
    reward: Any
    done: jax.Array  # bool or float depending on env
    info: dict[str, Any]
    metrics: dict[str, Any]
