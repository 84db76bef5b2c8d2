"""Pure-JAX analytic control environments.

The reference relies on ``mujoco_playground`` (MJX / MuJoCo-Warp) for
physics. On TPU the only jit-able physics path is pure XLA, so this
framework ships a small analytic env suite that compiles to trivially
vectorizable XLA (fused elementwise math — no gather/scatter, no
data-dependent shapes) and scales to tens of thousands of parallel envs
per chip. ``CartpoleBalance``/``CartpoleSwingup`` mirror the
dm_control-style cartpole used by the reference benchmarks
(``examples/compare_with_brax.py``): 5-D obs
``[x, cos θ, sin θ, ẋ, θ̇]``, 1-D action in [-1, 1], smooth bounded
rewards in [0, 1] per step.

External MJX / mujoco_playground envs still plug in unchanged — anything
satisfying the ``RLEnv`` protocol works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State


def _tolerance(x: jax.Array, bound: float, margin: float) -> jax.Array:
    """dm_control-style smooth tolerance: 1 inside ``|x| <= bound``,
    gaussian falloff with scale ``margin`` outside."""
    d = jnp.maximum(jnp.abs(x) - bound, 0.0)
    return jnp.exp(-0.5 * (d / margin) ** 2)


class _Cartpole:
    """Shared cart-pole dynamics (classic Barto-Sutton equations,
    semi-implicit Euler)."""

    gravity: float = 9.8
    cart_mass: float = 1.0
    pole_mass: float = 0.1
    pole_half_length: float = 0.5
    force_mag: float = 10.0
    dt: float = 0.02
    x_limit: float = 2.4
    # Episode ends when |theta| exceeds this (None = no angle limit).
    angle_limit: float | None = None

    observation_size: int = 5
    action_size: int = 1

    def _physics(self, q: jax.Array, action: jax.Array) -> jax.Array:
        x, theta, x_dot, theta_dot = q[0], q[1], q[2], q[3]
        force = self.force_mag * jnp.clip(action, -1.0, 1.0).reshape(())
        total_mass = self.cart_mass + self.pole_mass
        ml = self.pole_mass * self.pole_half_length
        cos_t = jnp.cos(theta)
        sin_t = jnp.sin(theta)
        temp = (force + ml * theta_dot**2 * sin_t) / total_mass
        theta_acc = (self.gravity * sin_t - cos_t * temp) / (
            self.pole_half_length
            * (4.0 / 3.0 - self.pole_mass * cos_t**2 / total_mass)
        )
        x_acc = temp - ml * theta_acc * cos_t / total_mass
        x_dot = x_dot + self.dt * x_acc
        theta_dot = theta_dot + self.dt * theta_acc
        x = x + self.dt * x_dot
        theta = theta + self.dt * theta_dot
        return jnp.stack([x, theta, x_dot, theta_dot])

    def _obs(self, q: jax.Array) -> jax.Array:
        x, theta, x_dot, theta_dot = q[0], q[1], q[2], q[3]
        return jnp.stack([x, jnp.cos(theta), jnp.sin(theta), x_dot, theta_dot])

    def _reward(self, q: jax.Array) -> jax.Array:
        upright = (jnp.cos(q[1]) + 1.0) / 2.0
        centered = _tolerance(q[0], bound=0.25, margin=1.0)
        small_velocity = _tolerance(q[3], bound=0.5, margin=2.0)
        return upright * (1.0 + centered) / 2.0 * (1.0 + small_velocity) / 2.0

    def _state(self, q: jax.Array) -> State:
        reward = self._reward(q)
        done = jnp.abs(q[0]) > self.x_limit
        if self.angle_limit is not None:
            done = jnp.logical_or(done, jnp.abs(q[1]) > self.angle_limit)
        done = done.astype(jnp.float32)
        return State(
            data={"q": q},
            obs=self._obs(q),
            reward=reward,
            done=done,
            info={},
            metrics={"reward": reward},
        )

    def step(self, state: State, action: jax.Array) -> State:
        return self._state(self._physics(state.data["q"], action))

    def render(self, trajectory, height: int = 240, width: int = 320):
        """Rasterize a trajectory of (Slim)States into HWC uint8 frames —
        completes the video pipeline (``eval_rollout_for_render_scan`` →
        ``unstack_trajectory`` → ``env.render`` → ``video_fn``) for the
        analytic env suite without any graphics dependency."""
        import numpy as np

        frames = []
        scale = width / (2 * self.x_limit + 1.0)
        pole_len = 2 * self.pole_half_length * scale
        cart_y = int(height * 0.7)
        for slim in trajectory:
            q = np.asarray(jax.device_get(slim.data["q"]))
            x, theta = float(q[0]), float(q[1])
            frame = np.full((height, width, 3), 255, np.uint8)
            frame[cart_y + 3, :, :] = 120  # track
            cx = int(width / 2 + x * scale)
            frame[
                max(cart_y - 8, 0) : cart_y + 3,
                max(cx - 14, 0) : min(cx + 14, width),
                :,
            ] = (40, 40, 200)
            # Pole: sample points along its length.
            tip_dx, tip_dy = np.sin(theta) * pole_len, np.cos(theta) * pole_len
            for t in np.linspace(0.0, 1.0, int(pole_len) * 2):
                px = int(cx + t * tip_dx)
                py = int(cart_y - 8 - t * tip_dy)
                if 0 <= px < width - 1 and 0 <= py < height - 1:
                    frame[py : py + 2, px : px + 2, :] = (200, 60, 40)
            frames.append(frame)
        return frames


class CartpoleBalance(_Cartpole):
    """Start near upright; keep the pole balanced and the cart centered.
    The episode terminates when the pole falls past ``angle_limit``, so
    a random policy dies early while a balancing policy collects dense
    reward for the full episode."""

    angle_limit: float | None = 0.8

    def reset(self, rng: jax.Array) -> State:
        q = 0.05 * jax.random.normal(rng, (4,))
        return self._state(q)


class CartpoleSwingup(_Cartpole):
    """Start hanging down; swing up and balance."""

    def reset(self, rng: jax.Array) -> State:
        noise = 0.05 * jax.random.normal(rng, (4,))
        q = noise.at[1].add(jnp.pi)
        return self._state(q)


class Pendulum:
    """Classic torque-limited pendulum swing-up. 3-D obs
    ``[cos θ, sin θ, θ̇]``, 1-D action, reward in [0, 1]."""

    gravity: float = 10.0
    mass: float = 1.0
    length: float = 1.0
    dt: float = 0.05
    max_torque: float = 2.0
    max_speed: float = 8.0

    observation_size: int = 3
    action_size: int = 1

    def reset(self, rng: jax.Array) -> State:
        k1, k2 = jax.random.split(rng)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        return self._state(jnp.stack([theta, theta_dot]))

    def step(self, state: State, action: jax.Array) -> State:
        theta, theta_dot = state.data["q"][0], state.data["q"][1]
        torque = self.max_torque * jnp.clip(action, -1.0, 1.0).reshape(())
        theta_acc = (
            3.0 * self.gravity / (2.0 * self.length) * jnp.sin(theta)
            + 3.0 / (self.mass * self.length**2) * torque
        )
        theta_dot = jnp.clip(
            theta_dot + self.dt * theta_acc, -self.max_speed, self.max_speed
        )
        theta = theta + self.dt * theta_dot
        return self._state(jnp.stack([theta, theta_dot]))

    def _state(self, q: jax.Array) -> State:
        theta, theta_dot = q[0], q[1]
        upright = (jnp.cos(theta) + 1.0) / 2.0
        still = jnp.exp(-0.1 * theta_dot**2)
        reward = upright * (0.8 + 0.2 * still)
        return State(
            data={"q": q},
            obs=jnp.stack([jnp.cos(theta), jnp.sin(theta), theta_dot]),
            reward=reward,
            done=jnp.array(0.0),
            info={},
            metrics={"reward": reward},
        )
