"""Rollout machinery (capability parity with reference
``nnx_ppo/algorithms/rollout.py``), as pure ``jax.lax.scan`` programs.

The env is a *single unbatched* env; the library vmaps it to ``n_envs``.
On a data-parallel mesh the env-batch axis of every carry/buffer is
sharded over ``data``; the scans below contain no cross-env
communication, so each chip steps its own env shard independently.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jaxtyping import Key

from nnx_ppo_tpu.core.struct import tree_where
from nnx_ppo_tpu.algorithms.types import EnvState, RLEnv, Transition
from nnx_ppo_tpu.networks.types import ModuleState, StatefulModule


def single_transition(
    env: RLEnv,
    networks: StatefulModule,
    carry: tuple[ModuleState, EnvState],
    rng_keys_for_env_reset: Key[jax.Array, "batch"],
) -> tuple[tuple[ModuleState, EnvState], Transition]:
    """One batched env step: net forward → env.step → auto-reset both
    the env state and the net carry where ``done``.

    Reference: ``rollout.py:11-45``.
    """
    network_state, env_state = carry
    out = networks(network_state, env_state.obs)
    next_network_state = out.next_state
    ppo_output = out.output
    next_env_state = jax.vmap(env.step)(env_state, ppo_output.actions)
    transition = Transition(
        obs=env_state.obs,
        network_output=ppo_output,
        rewards=next_env_state.reward,
        done=next_env_state.done.astype(bool),
        truncated=next_env_state.info.get(
            "truncated", jnp.zeros(next_env_state.done.shape, bool)
        ).astype(bool),
        next_obs=next_env_state.obs,
        metrics={"env": next_env_state.metrics, "net": out.metrics},
        rollout_extras=out.rollout_extras,
    )

    done = transition.done
    reset_states = jax.vmap(env.reset)(rng_keys_for_env_reset)
    next_env_state = tree_where(done, reset_states, next_env_state)

    reset_network_states = networks.reset_state(next_network_state)
    next_network_state = tree_where(done, reset_network_states, next_network_state)

    return (next_network_state, next_env_state), transition


def unroll_env(
    env: RLEnv,
    env_state: EnvState,
    networks: StatefulModule,
    network_state: ModuleState,
    unroll_length: int,
    rng_key_for_env_reset: Key[jax.Array, ""],
) -> tuple[ModuleState, EnvState, Transition]:
    """Scan :func:`single_transition` over T steps with pre-split
    ``[T, B]`` reset keys. Reference: ``rollout.py:48-73``."""
    batch_size = env_state.done.shape[0]
    rng_keys = jax.random.split(rng_key_for_env_reset, (unroll_length, batch_size))
    step = functools.partial(single_transition, env, networks)
    (final_network_state, final_env_state), rollout = jax.lax.scan(
        step, (network_state, env_state), rng_keys
    )
    shapes_match = jax.tree.map(
        lambda v, r: v.shape == r.shape,
        rollout.network_output.value_estimates,
        rollout.rewards,
    )
    assert all(jax.tree.leaves(shapes_match)), (
        "value_estimates shapes must match rewards shapes (per reward key)"
    )
    return final_network_state, final_env_state, rollout


def _add_reward_metrics(
    out: dict,
    name: str,
    reward: Any,
    percentile_levels: Optional[tuple[int, ...]],
) -> None:
    """Recursively build named metrics from a reward pytree."""
    from collections.abc import Mapping

    if isinstance(reward, Mapping):
        for k, v in reward.items():
            _add_reward_metrics(out, f"{name}/{k}", v, percentile_levels)
    elif percentile_levels is not None:
        percentiles = jnp.percentile(reward, jnp.array(percentile_levels))
        for pl, p in zip(percentile_levels, percentiles):
            out[f"{name}/p{int(pl)}"] = p
    else:
        out[f"{name}/mean"] = reward.mean()
        out[f"{name}/std"] = reward.std()


def eval_rollout(
    env: RLEnv,
    networks: StatefulModule,
    n_envs: int,
    max_episode_length: int,
    key: Key[jax.Array, ""],
    logging_percentiles: Optional[tuple[int, ...]] = None,
) -> dict[str, jax.Array]:
    """Fresh-env evaluation: done latches, reward accumulates only while
    alive; emits lifespan and per-reward-key episode reward stats.

    Reference: ``rollout.py:97-148``.
    """
    env_keys = jax.random.split(key, n_envs)
    env_states = jax.vmap(env.reset)(env_keys)
    net_states = networks.initialize_state(n_envs)

    def step(carry, _):
        env_state, network_state, cuml_reward, lifespan = carry
        out = networks(network_state, env_state.obs)
        next_env_state = jax.vmap(env.step)(env_state, out.output.actions)
        next_env_state = next_env_state.replace(
            done=jnp.logical_or(
                next_env_state.done.astype(bool), env_state.done.astype(bool)
            ).astype(next_env_state.done.dtype)
        )
        # Accumulate reward only if the env was not already done.
        was_done = env_state.done.astype(bool)
        reward_this_step = jax.tree.map(
            lambda r: jnp.where(was_done, jnp.zeros_like(r), r),
            next_env_state.reward,
        )
        cuml_reward = jax.tree.map(jnp.add, cuml_reward, reward_this_step)
        lifespan += jnp.where(next_env_state.done.astype(bool), 0.0, 1.0)
        return (next_env_state, out.next_state, cuml_reward, lifespan), None

    init_carry = (
        env_states,
        net_states,
        jax.tree.map(jnp.zeros_like, env_states.reward),
        jnp.zeros(n_envs),
    )
    (_, _, cuml_reward, lifespan), _ = jax.lax.scan(
        step, init_carry, None, length=max_episode_length
    )

    metrics = dict(lifespan_mean=lifespan.mean(), lifespan_std=lifespan.std())
    _add_reward_metrics(metrics, "episode_reward", cuml_reward, logging_percentiles)
    if logging_percentiles is not None:
        percentiles = jnp.percentile(lifespan, jnp.array(logging_percentiles))
        for pl, p in zip(logging_percentiles, percentiles):
            metrics[f"lifespan/p{int(pl)}"] = p
    return metrics


class SlimData(NamedTuple):
    """Minimal physics-data fields needed for rendering."""

    qpos: Any
    qvel: Any
    time: Any
    mocap_pos: Any
    mocap_quat: Any
    xfrc_applied: Any


class SlimState(NamedTuple):
    """Minimal env state for rendering — avoids stacking large contact /
    constraint buffers over T (reference ``rollout.py:150-185``)."""

    data: Any
    done: Any
    info: Any
    metrics: Any


def _slim(env_state: EnvState):
    # (returns SlimState; annotation omitted — the suite's typeguard
    # hook mis-resolves same-module NamedTuple forward refs on py3.12)
    """Extract only render-relevant fields. If the env state carries
    MuJoCo-style ``.data``, keep the slim field subset; otherwise keep
    the data/obs payload as-is (analytic envs are already small)."""
    data = getattr(env_state, "data", None)
    if data is not None and hasattr(data, "qpos"):
        data = SlimData(
            qpos=data.qpos,
            qvel=data.qvel,
            time=getattr(data, "time", jnp.zeros(())),
            mocap_pos=getattr(data, "mocap_pos", jnp.zeros(())),
            mocap_quat=getattr(data, "mocap_quat", jnp.zeros(())),
            xfrc_applied=getattr(data, "xfrc_applied", jnp.zeros(())),
        )
    elif data is None:
        data = env_state.obs
    return SlimState(
        data=data,
        done=env_state.done,
        info=env_state.info,
        metrics=env_state.metrics,
    )


def eval_rollout_for_render_scan(
    env: RLEnv,
    networks: StatefulModule,
    max_episode_length: int,
    key: Key[jax.Array, ""],
):
    # (returns (stacked SlimState, final SlimState, episode_reward);
    # annotation omitted — typeguard 2.x cannot evaluate same-module
    # NamedTuple forward refs on py3.12)
    """Single-env scan collecting stacked :class:`SlimState` s for host-
    side rendering. Reference: ``rollout.py:188-255``.

    Returns (stacked_states [T], final_state, total_reward).
    """
    key, key2 = jax.random.split(key)
    env_state = env.reset(key)
    net_state = networks.initialize_state(1)
    net_state = jax.tree.map(lambda x: x[0], net_state)

    def step_fn(carry, _):
        env_state, net_state, cumulative_reward, already_done, rng = carry

        obs_batched = jax.tree.map(lambda x: x[None], env_state.obs)
        net_state_batched = jax.tree.map(lambda x: x[None], net_state)
        out = networks(net_state_batched, obs_batched)
        next_net_state = jax.tree.map(lambda x: x[0], out.next_state)
        action = jax.tree.map(lambda x: x[0], out.output.actions)

        next_env_state = env.step(env_state, action)
        reward_sum = sum(jax.tree.leaves(next_env_state.reward))
        new_cumulative_reward = cumulative_reward + jnp.where(
            already_done, 0.0, reward_sum
        )
        new_already_done = jnp.logical_or(
            already_done, next_env_state.done.astype(bool)
        )
        rng, reset_rng = jax.random.split(rng)
        done = next_env_state.done.astype(bool)  # scalar: single env
        reset_env_state = env.reset(reset_rng)
        next_env_state = jax.tree.map(
            lambda r, n: jnp.where(done, r, n), reset_env_state, next_env_state
        )
        reset_net_state = networks.reset_state(
            jax.tree.map(lambda x: x[None], next_net_state)
        )
        reset_net_state = jax.tree.map(lambda x: x[0], reset_net_state)
        next_net_state = jax.tree.map(
            lambda r, n: jnp.where(done, r, n), reset_net_state, next_net_state
        )

        return (
            next_env_state,
            next_net_state,
            new_cumulative_reward,
            new_already_done,
            rng,
        ), _slim(env_state)

    init_carry = (env_state, net_state, jnp.array(0.0), jnp.array(False), key2)
    (final_env_state, _, total_reward, _, _), stacked_states = jax.lax.scan(
        step_fn, init_carry, None, length=max_episode_length
    )
    return stacked_states, _slim(final_env_state), total_reward


def unstack_trajectory(stacked_states, final_state, max_episode_length: int):
    """Convert stacked scan output into a per-step list for rendering.
    Must be called outside JIT. Reference: ``rollout.py:258-267``."""
    trajectory = [
        jax.tree.map(lambda x: x[i], stacked_states)
        for i in range(max_episode_length)
    ]
    trajectory.append(final_state)
    return trajectory
