"""Metrics computation (capability parity with reference
``nnx_ppo/algorithms/metrics.py``). Everything here runs inside the
jitted train step; all reductions are global (GSPMD inserts cross-chip
all-reduces automatically when inputs are sharded)."""

from __future__ import annotations

import warnings
from collections.abc import Mapping
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.algorithms.types import LoggingLevel, Transition
from nnx_ppo_tpu.core.struct import partition_params
from nnx_ppo_tpu.networks.types import StatefulModule


def compute_metrics(
    loss_metrics: dict[str, Any],
    rollout_data: Transition,
    logging_level: LoggingLevel,
    percentile_levels: Optional[tuple[int, ...]] = None,
) -> dict[str, Any]:
    """Flag-gated metric dict built inside jit (reference
    ``metrics.py:17-69``)."""
    metrics: dict[str, Any] = {}
    for k, v in loss_metrics.items():
        _log_metric(metrics, k, v, percentile_levels)
    if LoggingLevel.TRAINING_ENV_METRICS in logging_level:
        for k, v in rollout_data.metrics.items():
            _log_metric(metrics, k, v, percentile_levels)
    if LoggingLevel.TRAIN_ROLLOUT_STATS in logging_level:
        _log_metric(
            metrics, "rollout_batch/reward", rollout_data.rewards, percentile_levels
        )
        _log_metric(
            metrics,
            "rollout_batch/action",
            rollout_data.network_output.actions,
            percentile_levels,
        )
        metrics["rollout_batch/done_rate"] = rollout_data.done.mean()
        metrics["rollout_batch/truncation_rate"] = rollout_data.truncated.mean()
    if LoggingLevel.ROLLOUT_OBS in logging_level:
        _log_metric(metrics, "rollout_batch/obs", rollout_data.obs, percentile_levels)
    if LoggingLevel.ACTOR_EXTRA in logging_level:
        _log_metric(
            metrics,
            "loglikelihood",
            rollout_data.network_output.loglikelihoods,
            percentile_levels,
        )
    if LoggingLevel.CRITIC_EXTRA in logging_level:
        _log_metric(
            metrics,
            "losses/predicted_value",
            rollout_data.network_output.value_estimates,
            percentile_levels,
        )
    return metrics


def _log_metric(
    metrics: dict[str, Any],
    name: str,
    x: Union[Mapping, jax.Array],
    percentile_levels: Optional[tuple[int, ...]] = None,
) -> None:
    """Recursive metric logging: Mapping → nested names; bool arrays →
    fraction-true; otherwise mean/std or percentiles (reference
    ``metrics.py:72-100``)."""
    if isinstance(x, Mapping):
        for k, v in x.items():
            _log_metric(metrics, f"{name}/{k}", v, percentile_levels)
        return
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.bool_):
        metrics[name] = jnp.mean(x)
    elif percentile_levels is None or len(percentile_levels) == 0:
        metrics[f"{name}/mean"] = jnp.mean(x)
        metrics[f"{name}/std"] = jnp.std(x)
    else:
        percentiles = jnp.percentile(x, jnp.array(percentile_levels))
        for pl, p in zip(percentile_levels, percentiles):
            metrics[f"{name}/p{int(pl)}"] = p


def log_weight_stats(
    metrics: dict[str, Any],
    networks: StatefulModule,
    percentile_levels: Optional[tuple[int, ...]] = None,
) -> None:
    """Aggregate stats over all trainable parameter leaves (reference
    ``metrics.py:103-121``; here the trainable partition replaces
    ``nnx.state(networks, nnx.Param)``)."""
    params, _ = partition_params(networks)
    leaves = jax.tree.leaves(params)
    if not leaves:
        warnings.warn("Network has no trainable param leaves; skipping weight stats.")
        return
    weights = jnp.concatenate([p.flatten() for p in leaves])
    _log_metric(metrics, "weights", weights, percentile_levels)
