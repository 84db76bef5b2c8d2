"""Analytic joystick-command locomotion environment.

Structurally mirrors the quadruped joystick tasks the reference is used
with (mujoco_playground's ``Go1JoystickFlatTerrain``): a legged-robot
abstraction tracks a randomly resampled velocity command, with **dict
observations** split into a proprioceptive stream and a command stream
— the workload shape of BASELINE configs 3 and 4 ("PyTree dict
observations routed to multi-stream network" / "quadruped locomotion
with obs normalization").

The dynamics are a planar rigid body driven through a fixed linear
"gait map" from 8 joint-like actuators to body-frame thrust / lateral
force / yaw torque, plus first-order actuator lag — pure fused XLA
elementwise math, no gather/scatter, so tens of thousands of envs step
in lockstep on one TPU chip.

Reward terms follow the playground joystick recipe: exponential
velocity-tracking kernels plus action-rate and energy penalties,
emitted as a **dict reward** (one GAE per key downstream, reference
``nnx_ppo/algorithms/ppo.py:447-454``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State


class JoystickLocomotion:
    """Velocity-command tracking with dict obs / dict rewards.

    Observation::

        {"proprio": [14]  (body-frame vel (3) ‖ actuator states (8) ‖
                           cos(heading), sin(heading), height
                           oscillator (3)),
         "command": [3]   (vx*, vy*, ω*)}

    Action: ``[8]`` in [-1, 1] (joint-like actuators).
    Reward: ``{"tracking": r_lin · r_ang, "penalty": -c₁‖Δa‖² - c₂‖a‖²}``.
    """

    n_actuators: int = 8
    dt: float = 0.02
    actuator_tau: float = 0.1  # first-order actuator lag
    drag: float = 1.2
    max_speed: float = 2.0
    max_yaw_rate: float = 2.0
    tracking_sigma: float = 0.25
    action_rate_cost: float = 0.01
    energy_cost: float = 0.002

    observation_size = {"proprio": 14, "command": 3}
    action_size: int = 8

    def __init__(self, command_resample_prob: float = 0.004):
        # Fixed full-rank gait map: 8 actuators → (thrust, lateral, yaw).
        # Deterministic constants (not trained, not per-env).
        key = jax.random.key(7)
        self._gait_map = jax.random.normal(key, (3, self.n_actuators)) / jnp.sqrt(
            self.n_actuators
        )
        self.command_resample_prob = command_resample_prob

    def _sample_command(self, rng: jax.Array) -> jax.Array:
        k1, k2, k3 = jax.random.split(rng, 3)
        vx = jax.random.uniform(k1, (), minval=-1.0, maxval=self.max_speed)
        vy = jax.random.uniform(k2, (), minval=-0.8, maxval=0.8)
        wz = jax.random.uniform(
            k3, (), minval=-self.max_yaw_rate, maxval=self.max_yaw_rate
        )
        return jnp.stack([vx, vy, wz])

    def _obs(self, q: dict) -> dict:
        vel = q["vel"]  # body-frame [vx, vy, wz]
        theta = q["theta"]
        proprio = jnp.concatenate(
            [
                vel,
                q["act"],  # 8 actuator states
                jnp.stack([jnp.cos(theta), jnp.sin(theta), q["height_osc"]]),
            ]
        )
        return {"proprio": proprio, "command": q["cmd"]}

    def _reward(self, q: dict, action: jax.Array, prev_action: jax.Array) -> dict:
        vel, cmd = q["vel"], q["cmd"]
        lin_err = jnp.sum((vel[:2] - cmd[:2]) ** 2)
        ang_err = (vel[2] - cmd[2]) ** 2
        tracking = jnp.exp(-lin_err / self.tracking_sigma) * jnp.exp(
            -ang_err / self.tracking_sigma
        )
        penalty = -(
            self.action_rate_cost * jnp.sum((action - prev_action) ** 2)
            + self.energy_cost * jnp.sum(action**2)
        )
        return {"tracking": tracking, "penalty": penalty}

    def _state(self, q: dict, reward: dict, done: jax.Array) -> State:
        return State(
            data=q,
            obs=self._obs(q),
            reward=reward,
            done=done,
            info={},
            metrics={
                "tracking_reward": reward["tracking"],
                "speed": jnp.linalg.norm(q["vel"][:2]),
            },
        )

    def reset(self, rng: jax.Array) -> State:
        k_cmd, k_vel, k_rng = jax.random.split(rng, 3)
        q = {
            "vel": 0.1 * jax.random.normal(k_vel, (3,)),
            "act": jnp.zeros(self.n_actuators),
            "prev_action": jnp.zeros(self.n_actuators),
            "theta": jnp.zeros(()),
            "height_osc": jnp.zeros(()),
            "cmd": self._sample_command(k_cmd),
            "rng": k_rng,  # per-env stream for command resampling
            "t": jnp.zeros(()),
        }
        zero_r = {"tracking": jnp.zeros(()), "penalty": jnp.zeros(())}
        return self._state(q, zero_r, jnp.zeros((), jnp.float32))

    def step(self, state: State, action: jax.Array) -> State:
        q = state.data
        action = jnp.clip(action.reshape(self.n_actuators), -1.0, 1.0)

        # First-order actuator lag, then gait map to body wrench.
        alpha = self.dt / self.actuator_tau
        act = q["act"] + alpha * (action - q["act"])
        wrench = self._gait_map @ act  # [thrust, lateral, yaw]

        vel = q["vel"] + self.dt * (3.0 * wrench - self.drag * q["vel"])
        vel = jnp.clip(vel, -2.0 * self.max_speed, 2.0 * self.max_speed)
        theta = q["theta"] + self.dt * vel[2]
        height_osc = jnp.sin(8.0 * jnp.pi * q["t"])  # gait-phase proxy

        # Occasionally resample the command mid-episode (per-env stream).
        rng, k_p, k_cmd = jax.random.split(q["rng"], 3)
        resample = jax.random.bernoulli(k_p, self.command_resample_prob)
        cmd = jnp.where(resample, self._sample_command(k_cmd), q["cmd"])

        new_q = {
            "vel": vel,
            "act": act,
            "prev_action": action,
            "theta": theta,
            "height_osc": height_osc,
            "cmd": cmd,
            "rng": rng,
            "t": q["t"] + self.dt,
        }
        reward = self._reward(new_q, action, q["prev_action"])
        # Fall proxy: terminate on extreme body velocity.
        done = (jnp.linalg.norm(vel) > 3.0 * self.max_speed).astype(jnp.float32)
        return self._state(new_q, reward, done)
