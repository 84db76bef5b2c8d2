"""Configuration dataclasses (capability parity with reference
``nnx_ppo/algorithms/config.py``), plus TPU-first additions:

* configs are **frozen** (hashable) so the whole ``PPOConfig`` can be a
  single static argument to the jitted train step — one arg instead of
  the reference's 12 static scalars (``ppo.py:105``);
* :class:`ShardingConfig` declares the device-mesh data-parallel layout.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from nnx_ppo_tpu.algorithms.types import (
    DistillationState,
    LoggingLevel,
    TrainingState,
)


@dataclass(frozen=True)
class PPOConfig:
    """Core PPO algorithm parameters (defaults match the reference
    ``config.py:11-31``)."""

    n_envs: int = 256
    rollout_length: int = 20
    total_steps: int = 512_000
    gae_lambda: float = 0.95
    discounting_factor: float = 0.99
    clip_range: float = 0.2
    learning_rate: float = 1e-4
    normalize_advantages: bool = True
    combine_advantages: bool = False
    n_epochs: int = 4
    n_minibatches: int = 4
    critic_loss_weight: float = 1.0
    # Linearly decay the learning rate to 0 over the run (the classic
    # PPO schedule; off by default to match the reference's fixed lr).
    # The decay horizon is derived from total_steps at train_ppo time
    # (one schedule step per minibatch update). Ignored when a custom
    # ``optimizer=`` is passed.
    anneal_lr: bool = False
    gradient_clipping: Optional[float] = None
    weight_decay: Optional[float] = None
    logging_level: LoggingLevel = LoggingLevel.LOSSES
    logging_percentiles: Optional[tuple[int, ...]] = None
    # Run the loss replay as one batched [T·B] forward instead of a
    # sequential T-step scan when the network is replay-time-static
    # (bitwise-identical losses; see StatefulModule.replay_time_static).
    # Networks with real temporal carries (LSTM/GRU/Delay/AR1/graphs)
    # automatically fall back to the exact scan path.
    fused_replay: bool = True
    # Memory layout of the rollout buffers the update loop consumes:
    # "time_major" keeps the rollout scan's native [T, B, ...] stacking
    # (per-minibatch gathers then transpose their output back to
    # time-major — an extra layout-copy chain measured at ~6% of the
    # quadruped megakernel step); "batch_major" transposes the loss's
    # working set ONCE per iteration to [B, T, ...] so each minibatch
    # gather is a contiguous-row gather whose native output layout IS
    # the replay layout, and the replay itself runs as one flat [B·T]
    # forward (networks.types.replay_sequence_nd — requires
    # fused_replay and a fully replay-time-static network). "auto"
    # (default) picks batch_major exactly when that requirement holds.
    # Identical minibatch membership and losses either way (up to float
    # reduction order).
    rollout_layout: str = "auto"
    # Storage dtype of the LARGE replay-view leaves (obs and the T+1
    # bootstrap obs) that the E·M per-minibatch gathers move:
    # "float32" (default, reference semantics) or "bfloat16", which
    # halves their gather bytes — the replay phase's dominant remaining
    # cost after the slim-view/batch-major work (docs/performance.md
    # "Device profile"). For networks that cast observations to
    # bfloat16 at their first layer (``compute_dtype=jnp.bfloat16``
    # stacks without obs normalization) the downcast is EXACT: the
    # replay performs the same rounding either way, losses and grads
    # are bitwise-identical (tests/test_replay_layout.py). Otherwise
    # the replay consumes bf16-rounded observations (~3 decimal
    # digits) — loglikelihoods/rewards/extras always stay exact, so
    # the epoch-0 ratio==1 invariant is unaffected.
    replay_store_dtype: str = "float32"
    # Random minibatch shuffling per epoch (the reference's semantics;
    # default). ``False`` replaces the per-minibatch permutation
    # GATHERS with contiguous (shard-local) dynamic slices of the
    # rollout buffers — minibatches become fixed env blocks within the
    # iteration. Measured on one v5e: +21% train_sps on the quadruped
    # megakernel config (14.7M vs 12.1M — a device profile showed the
    # gathers plus their layout copies costing ~16% of the step), at
    # the cost of epochs revisiting the same data partition; fresh
    # rollouts still re-randomize content every iteration and a
    # convergence gate covers the off mode (tests/test_parallel.py).
    shuffle_minibatches: bool = True
    # Fuse this many PPO iterations into one XLA program (lax.scan over
    # the train step). Amortizes per-program host-dispatch latency —
    # dominant on remote/tunneled TPU runtimes once the device step is
    # sub-millisecond. Metrics/callbacks then run once per *call*
    # (every steps_per_call · n_envs · rollout_length env steps).
    steps_per_call: int = 1


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation rollout configuration."""

    enabled: bool = True
    every_steps: int = 50_000
    n_envs: int = 64
    max_episode_length: int = 1000
    logging_level: LoggingLevel = LoggingLevel.BASIC
    logging_percentiles: Optional[tuple[int, ...]] = (0, 25, 50, 75, 100)


@dataclass(frozen=True)
class VideoConfig:
    """Video recording configuration."""

    enabled: bool = False
    every_steps: int = 200_000
    episode_length: int = 1000
    render_kwargs: tuple[tuple[str, Any], ...] = (("height", 480), ("width", 640))

    @property
    def render_kwargs_dict(self) -> dict[str, Any]:
        return dict(self.render_kwargs)


@dataclass(frozen=True)
class TrainConfig:
    """Complete training configuration."""

    ppo: PPOConfig = field(default_factory=PPOConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    video: VideoConfig = field(default_factory=VideoConfig)
    seed: int = 17
    checkpoint_every_steps: int = 500_000


@dataclass(frozen=True)
class DistillationConfig:
    """Core distillation algorithm parameters."""

    n_envs: int = 256
    rollout_length: int = 20
    total_steps: int = 512_000
    learning_rate: float = 1e-4
    n_epochs: int = 4
    n_minibatches: int = 4
    gradient_clipping: Optional[float] = None
    weight_decay: Optional[float] = None
    logging_level: LoggingLevel = LoggingLevel.LOSSES
    logging_percentiles: Optional[tuple[int, ...]] = None
    # Time-fused student replay (see PPOConfig.fused_replay).
    fused_replay: bool = True
    # Rollout-buffer layout for the update loop (see
    # PPOConfig.rollout_layout; "auto" = batch-major when the student
    # is fully replay-time-static and fused_replay is on).
    rollout_layout: str = "auto"
    # Storage dtype of the gathered obs leaves (see
    # PPOConfig.replay_store_dtype — same trade-off; the teacher's
    # extras always stay exact so the NLL target is unchanged).
    replay_store_dtype: str = "float32"
    # Contiguous-slice minibatching (see PPOConfig.shuffle_minibatches;
    # same measured trade-off — the permutation gathers are the same
    # program structure in distillation_step).
    shuffle_minibatches: bool = True


@dataclass(frozen=True)
class DistillationTrainConfig:
    """Complete training configuration for distillation."""

    distillation: DistillationConfig = field(default_factory=DistillationConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    video: VideoConfig = field(default_factory=VideoConfig)
    seed: int = 17
    checkpoint_every_steps: int = 500_000


@dataclass
class VideoData:
    """Data passed to the video callback."""

    frames: np.ndarray  # (T, H, W, C), uint8
    step: int
    episode_reward: float
    episode_length: int


@dataclass
class TrainResult:
    """Result of train_ppo: final state, metrics, eval history."""

    training_state: TrainingState
    final_metrics: dict[str, Any]
    eval_history: list[dict[str, Any]]
    total_steps: int
    total_iterations: int


@dataclass
class DistillationTrainResult:
    """Result of train_distillation."""

    training_state: DistillationState
    final_metrics: dict[str, Any]
    eval_history: list[dict[str, Any]]
    total_steps: int
    total_iterations: int
