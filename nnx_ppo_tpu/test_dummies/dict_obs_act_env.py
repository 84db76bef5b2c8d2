"""Dict-obs / dict-action / multi-agent test dummies (capability parity
with reference ``test_dummies/dict_obs_act_env.py``). Verify the PPO
pipeline handles PyTree obs, actions, rewards and multi-head values."""

from __future__ import annotations

from typing import Any

import jax
import jax.flatten_util
import jax.numpy as jnp

from nnx_ppo_tpu.core.struct import pytree_dataclass
from nnx_ppo_tpu.envs.types import State
from nnx_ppo_tpu.networks.types import (
    ModuleOutput,
    PPONetworkOutput,
    StatefulModule,
)


class DictObsActEnv:
    """2-D env with dict obs ``{"pos", "vel"}`` and dict action
    ``{"force"}``; vel += 0.1·force, pos += vel; reward exp(−|pos|);
    done at |pos| > 3."""

    def reset(self, rng: jax.Array) -> State:
        pos = jax.random.uniform(rng, (2,), minval=-1.0, maxval=1.0)
        return self._make_state(pos, jnp.zeros(2))

    def step(self, state: State, action: dict) -> State:
        new_vel = state.obs["vel"] + action["force"] * 0.1
        new_pos = state.obs["pos"] + new_vel
        return self._make_state(new_pos, new_vel)

    def _make_state(self, pos, vel) -> State:
        dist = jnp.sqrt(jnp.sum(pos**2))
        return State(
            data={},
            obs={"pos": pos, "vel": vel},
            reward=jnp.exp(-dist),
            done=(dist > 3.0).astype(float),
            info={},
            metrics={},
        )


@pytree_dataclass
class DictObsActNet(StatefulModule):
    """Minimal net: dict obs in, dict action out; loglikelihoods pinned
    at 0 (pipeline test; critic gradients still flow)."""

    actor_kernel: jax.Array
    critic_kernel: jax.Array

    @classmethod
    def create(cls, key: jax.Array) -> "DictObsActNet":
        k1, k2 = jax.random.split(key)
        init = jax.nn.initializers.lecun_normal()
        return cls(
            actor_kernel=init(k1, (4, 2)), critic_kernel=init(k2, (4, 1))
        )

    def __call__(self, network_state, obs, rollout_extras: Any = None):
        obs_flat = jnp.concatenate([obs["pos"], obs["vel"]], axis=-1)
        actor_out = obs_flat @ self.actor_kernel
        value = jnp.squeeze(obs_flat @ self.critic_kernel, axis=-1)

        if rollout_extras is not None:
            raw_action = rollout_extras
        else:
            raw_action = {"force": actor_out}
        actions = {"force": jnp.tanh(raw_action["force"])}
        batch_size = obs_flat.shape[0]

        return ModuleOutput(
            next_state=network_state,
            output=PPONetworkOutput(
                actions=actions,
                loglikelihoods=jnp.zeros(batch_size),
                value_estimates=value,
            ),
            regularization_loss=jnp.zeros(batch_size),
            metrics={},
            rollout_extras=raw_action,
        )

    def initialize_state(self, batch_size: int):
        return ()


class TwoArmEnv:
    """Minimal multi-agent env: per-arm obs dicts, per-arm actions,
    per-arm (dict) rewards with a single shared done flag."""

    def reset(self, rng: jax.Array) -> State:
        pos = {
            "arm1": jax.random.uniform(rng, (2,), minval=-1.0, maxval=1.0),
            "arm2": jax.random.uniform(
                jax.random.fold_in(rng, 1), (2,), minval=-1.0, maxval=1.0
            ),
        }
        vel = {"arm1": jnp.zeros(2), "arm2": jnp.zeros(2)}
        return self._make_state(pos, vel)

    def step(self, state: State, action: dict) -> State:
        new_vel = {
            "arm1": state.obs["arm1"]["vel"] + 0.1 * action["arm1"],
            "arm2": state.obs["arm2"]["vel"] + 0.1 * action["arm2"],
        }
        new_pos = {
            "arm1": state.obs["arm1"]["pos"] + 0.1 * new_vel["arm1"],
            "arm2": state.obs["arm2"]["pos"] + 0.1 * new_vel["arm2"],
        }
        return self._make_state(new_pos, new_vel)

    def _make_state(self, pos, vel) -> State:
        reward = jax.tree.map(lambda p: jnp.exp(-jnp.sqrt(jnp.sum(p**2))), pos)
        done = jnp.logical_or(
            jnp.sqrt(jnp.sum(pos["arm1"] ** 2)) > 3.0,
            jnp.sqrt(jnp.sum(pos["arm2"] ** 2)) > 3.0,
        )
        obs = jax.tree.map(
            lambda p, v: {"pos": p, "vel": v}, pos, vel,
            is_leaf=lambda x: isinstance(x, jax.Array),
        )
        return State(data={}, obs=obs, reward=reward, done=done, info={}, metrics={})


@pytree_dataclass
class TwoArmNet(StatefulModule):
    """Dict obs/actions and dict (multi-head) value estimates."""

    actor_kernel: jax.Array
    critic_kernel: jax.Array

    @classmethod
    def create(cls, key: jax.Array) -> "TwoArmNet":
        k1, k2 = jax.random.split(key)
        init = jax.nn.initializers.lecun_normal()
        return cls(
            actor_kernel=init(k1, (8, 4)), critic_kernel=init(k2, (8, 2))
        )

    def __call__(self, network_state, obs, rollout_extras: Any = None):
        obs_flat = jax.vmap(lambda t: jax.flatten_util.ravel_pytree(t)[0])(obs)
        actor_out = obs_flat @ self.actor_kernel
        critic_out = obs_flat @ self.critic_kernel
        batch_size = obs_flat.shape[0]
        return ModuleOutput(
            next_state=network_state,
            output=PPONetworkOutput(
                actions={"arm1": actor_out[:, :2], "arm2": actor_out[:, 2:]},
                loglikelihoods={
                    "arm1": jnp.zeros(batch_size),
                    "arm2": jnp.zeros(batch_size),
                },
                value_estimates={
                    "arm1": critic_out[:, 0],
                    "arm2": critic_out[:, 1],
                },
            ),
            regularization_loss=jnp.zeros(batch_size),
            metrics={},
            rollout_extras=None,
        )

    def initialize_state(self, batch_size: int):
        return ()
