"""N-link pendulum ("chain") — analytic articulated-body physics.

A heavy-compute stand-in for the humanoid-class MJX workloads the
reference is used with (BASELINE config 5: "HumanoidWalk at 8192 envs
sharded over multi-host slice"): per env and per substep it assembles
the full ``[n, n]`` mass matrix of an n-link serial pendulum and solves
``M(θ) θ̈ = τ − C(θ, θ̇) − g(θ)`` with a Cholesky solve. That puts real
dense-linear-algebra FLOPs in the env step — the same compute profile
as articulated rigid-body dynamics (MuJoCo's CRBA + LDLT) — while
remaining pure XLA with static shapes, so it vmaps to 8k+ envs and
shards over a data-parallel mesh untouched.

Dynamics (absolute link angles θᵢ from vertical, point mass mᵢ at the
end of each massless rod lᵢ — standard textbook n-pendulum):

    M[i,j] = lᵢ lⱼ cos(θᵢ − θⱼ) Σ_{k ≥ max(i,j)} m_k
    C[i]   = Σ_j lᵢ lⱼ sin(θᵢ − θⱼ) θ̇ⱼ² Σ_{k ≥ max(i,j)} m_k
    g[i]   = −g lᵢ sin(θᵢ) Σ_{k ≥ i} m_k        (θ = 0 is *up*)

Task: swing the chain tip up and hold it at maximum height
(``NLinkSwingup``) — n_links=1 reduces to the classic pendulum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.envs.types import State
from nnx_ppo_tpu.ops.linalg import cholesky_solve_small


class NLinkSwingup:
    """Swing-up and balance for an n-link torque-driven pendulum.

    Observation: ``[3n]`` = ``[cos θ, sin θ, θ̇ / 5]`` per link.
    Action: ``[n]`` joint torques in [-1, 1] (scaled by ``max_torque``).
    Reward: normalized tip height in [0, 1] minus small velocity and
    torque penalties.
    """

    def __init__(
        self,
        n_links: int = 5,
        link_length: float | None = None,
        link_mass: float = 1.0,
        max_torque: float = 8.0,
        dt: float = 0.02,
        n_substeps: int = 4,
        damping: float = 0.4,
        gravity: float = 9.8,
    ):
        self.n_links = n_links
        # Total length 1.0 by default so tip height is scale-free.
        self.lengths = jnp.full((n_links,), link_length or 1.0 / n_links)
        self.masses = jnp.full((n_links,), link_mass)
        self.max_torque = max_torque
        self.dt = dt
        self.n_substeps = n_substeps
        self.damping = damping
        self.gravity = gravity
        # tail_mass[i] = sum_{k >= i} m_k ; M uses tail_mass[max(i,j)].
        self._tail_mass = jnp.cumsum(self.masses[::-1])[::-1]
        self.observation_size = 3 * n_links
        self.action_size = n_links

    # -- dynamics ---------------------------------------------------------

    def _accel(self, theta: jax.Array, theta_dot: jax.Array, tau: jax.Array):
        l = self.lengths
        n = self.n_links
        idx = jnp.arange(n)
        tail = self._tail_mass[jnp.maximum(idx[:, None], idx[None, :])]  # [n,n]
        dth = theta[:, None] - theta[None, :]
        ll = l[:, None] * l[None, :]
        M = ll * jnp.cos(dth) * tail
        # Regularize for the Cholesky (masses are O(1); eps is negligible).
        M = M + 1e-9 * jnp.eye(n)
        C = (ll * jnp.sin(dth) * tail) @ (theta_dot**2)
        g_vec = -self.gravity * l * jnp.sin(theta) * self._tail_mass
        rhs = tau - C - g_vec - self.damping * theta_dot
        # Unrolled SPD solve: ~3x faster than the LAPACK-style custom
        # call for tiny per-env systems on TPU (ops/linalg.py).
        return cholesky_solve_small(M, rhs)

    def _physics(self, q: dict, action: jax.Array) -> dict:
        tau = self.max_torque * jnp.clip(action, -1.0, 1.0).reshape(self.n_links)
        h = self.dt / self.n_substeps

        def substep(carry, _):
            theta, theta_dot = carry
            acc = self._accel(theta, theta_dot, tau)
            theta_dot = jnp.clip(theta_dot + h * acc, -25.0, 25.0)
            theta = theta + h * theta_dot
            return (theta, theta_dot), None

        (theta, theta_dot), _ = jax.lax.scan(
            substep, (q["theta"], q["theta_dot"]), None, length=self.n_substeps
        )
        return {"theta": theta, "theta_dot": theta_dot}

    # -- task -------------------------------------------------------------

    def _tip_height(self, theta: jax.Array) -> jax.Array:
        return jnp.sum(self.lengths * jnp.cos(theta))  # θ=0 is up

    def _obs(self, q: dict) -> jax.Array:
        return jnp.concatenate(
            [jnp.cos(q["theta"]), jnp.sin(q["theta"]), q["theta_dot"] / 5.0]
        )

    def _state(self, q: dict, action: jax.Array) -> State:
        total_len = jnp.sum(self.lengths)
        height = self._tip_height(q["theta"]) / total_len  # [-1, 1]
        upright = (height + 1.0) / 2.0
        still = jnp.exp(-0.05 * jnp.sum(q["theta_dot"] ** 2))
        effort = 0.01 * jnp.mean(action**2)
        reward = upright * (0.7 + 0.3 * still) - effort
        return State(
            data=q,
            obs=self._obs(q),
            reward=reward,
            done=jnp.zeros((), jnp.float32),
            info={},
            metrics={"tip_height": height, "reward": reward},
        )

    def reset(self, rng: jax.Array) -> State:
        k1, k2 = jax.random.split(rng)
        # Start hanging down (θ = π) with small noise.
        theta = jnp.pi + 0.1 * jax.random.normal(k1, (self.n_links,))
        theta_dot = 0.1 * jax.random.normal(k2, (self.n_links,))
        return self._state(
            {"theta": theta, "theta_dot": theta_dot}, jnp.zeros(self.n_links)
        )

    def step(self, state: State, action: jax.Array) -> State:
        q = self._physics(state.data, action)
        return self._state(q, jnp.asarray(action).reshape(self.n_links))
