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


def _summarize(
    x: jax.Array, percentile_levels: Optional[tuple[int, ...]]
) -> dict[Optional[str], jax.Array]:
    """Reduce one array to named scalars.

    Boolean arrays become a single fraction-true entry (``None`` key =
    no suffix); float arrays become percentiles if levels were given,
    else mean/std. The metric *name format* (``name/mean``, ``name/pN``)
    is the logging contract shared with the reference
    (``nnx_ppo/docs/reference/logging.rst``).
    """
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.bool_):
        return {None: jnp.mean(x)}
    if percentile_levels:
        values = jnp.percentile(x, jnp.asarray(percentile_levels))
        return {
            f"p{int(level)}": values[i]
            for i, level in enumerate(percentile_levels)
        }
    return {"mean": jnp.mean(x), "std": jnp.std(x)}


def _log_metric(
    metrics: dict[str, Any],
    name: str,
    x: Union[Mapping, jax.Array],
    percentile_levels: Optional[tuple[int, ...]] = None,
) -> None:
    """Flatten a (possibly Mapping-nested) metric into scalar entries.

    Iterative worklist traversal: Mapping levels extend the name with
    ``/key``; array leaves are reduced by :func:`_summarize`.
    """
    pending: list[tuple[str, Any]] = [(name, x)]
    while pending:
        prefix, value = pending.pop()
        if isinstance(value, Mapping):
            pending.extend((f"{prefix}/{k}", v) for k, v in value.items())
            continue
        for suffix, scalar in _summarize(value, percentile_levels).items():
            metrics[prefix if suffix is None else f"{prefix}/{suffix}"] = scalar


def log_weight_stats(
    metrics: dict[str, Any],
    networks: StatefulModule,
    percentile_levels: Optional[tuple[int, ...]] = None,
) -> None:
    """Aggregate stats over all trainable parameter leaves (fills the
    role of reference ``metrics.py:103-121``; the trainable partition
    replaces ``nnx.state(networks, nnx.Param)``)."""
    params, _ = partition_params(networks)
    flat = [jnp.ravel(leaf) for leaf in jax.tree.leaves(params)]
    if not flat:
        warnings.warn("No trainable parameters found; weight stats skipped.")
        return
    _log_metric(metrics, "weights", jnp.concatenate(flat), percentile_levels)
