"""Runtime types for the PPO algorithm (capability parity with reference
``nnx_ppo/algorithms/types.py``)."""

from __future__ import annotations

import enum
from typing import Any, Optional, Protocol, runtime_checkable

import jax

from nnx_ppo_tpu.core.struct import field, pytree_dataclass
from nnx_ppo_tpu.networks.types import PPONetworkOutput


@runtime_checkable
class EnvState(Protocol):
    """Minimal environment state interface (reference ``types.py:15-34``).

    Satisfied by :class:`nnx_ppo_tpu.envs.types.State` and any compatible
    pytree with these read-only properties.
    """

    @property
    def obs(self) -> Any: ...
    @property
    def done(self) -> jax.Array: ...  # bool or float depending on env
    @property
    def reward(self) -> Any: ...
    @property
    def info(self) -> dict[str, Any]: ...
    @property
    def metrics(self) -> dict[str, Any]: ...


@runtime_checkable
class RLEnv(Protocol):
    """Single unbatched env; the library vmaps it to ``n_envs`` itself.

    Env instances must be hashable (they're static args to the jitted
    train step). Reference ``types.py:37-45``.
    """

    def reset(self, rng: jax.Array) -> EnvState: ...
    def step(self, state: Any, action: Any) -> EnvState: ...


@pytree_dataclass
class TrainingState:
    """Complete, exactly-resumable training state.

    Unlike the reference (which holds mutable nnx modules +
    ``nnx.Optimizer``), this is a plain pytree: ``networks`` is the
    immutable module pytree (params + stats + RNG base keys) and
    ``opt_state`` is the optax state over its trainable-params
    partition. The whole struct is donated to the jitted train step and
    carries per-leaf ``NamedSharding`` s on multi-chip meshes.
    """

    networks: Any  # StatefulModule pytree
    network_states: Any  # per-env carries, leading dim n_envs
    env_states: Any  # EnvState pytree, leading dim n_envs
    opt_state: Any  # optax state over partition_params(networks)[0]
    rng_key: jax.Array
    steps_taken: jax.Array  # f32 scalar


@pytree_dataclass
class Transition:
    """One (or a stacked ``[T]`` of) environment transition(s).

    ``rewards``/``done``/``truncated`` are ``[batch]`` for a single step
    and ``[time, batch]`` for a full rollout. ``rollout_extras`` is the
    per-step ROLLOUT→LOSS_REPLAY snapshot tree (mirrors the network's
    extras tree, ``None`` at leaves that emit nothing).
    """

    obs: Any
    network_output: PPONetworkOutput
    rewards: Any
    done: jax.Array
    truncated: jax.Array
    next_obs: Any
    metrics: dict[str, Any]
    rollout_extras: Any = None


@pytree_dataclass
class DistillationTransition:
    """Rollout transition for distillation training (reference
    ``types.py:83-107``). The student's actions drive the env; the
    teacher's ``rollout_extras`` (sampler slots hold the teacher mean,
    since the teacher runs in eval mode) are the distillation target."""

    obs: Any
    student_output: PPONetworkOutput  # drives env; logging only
    rewards: Any
    done: jax.Array
    truncated: jax.Array
    next_obs: Any
    metrics: dict[str, Any]
    student_rollout_extras: Any = None
    teacher_rollout_extras: Any = None


@pytree_dataclass
class DistillationState:
    """Training state for distillation (reference ``types.py:109-126``).
    The teacher module is an external argument; only its per-env carry
    is tracked here."""

    student: Any
    student_states: Any
    teacher_states: Any
    env_states: Any
    opt_state: Any
    rng_key: jax.Array
    steps_taken: jax.Array


class LoggingLevel(enum.Flag):
    LOSSES = enum.auto()
    CRITIC_EXTRA = enum.auto()
    ACTOR_EXTRA = enum.auto()
    TRAIN_ROLLOUT_STATS = enum.auto()
    ROLLOUT_OBS = enum.auto()
    TRAINING_ENV_METRICS = enum.auto()
    GRAD_NORM = enum.auto()
    WEIGHTS = enum.auto()
    THROUGHPUT = enum.auto()
    BASIC = LOSSES
    ALL = (
        LOSSES
        | ACTOR_EXTRA
        | CRITIC_EXTRA
        | TRAIN_ROLLOUT_STATS
        | TRAINING_ENV_METRICS
        | GRAD_NORM
        | WEIGHTS
        | ROLLOUT_OBS
        | THROUGHPUT
    )
    NONE = 0
