"""Train a policy on a robot imported from MuJoCo MJCF XML.

The robot below is described the way a MuJoCo user would write it —
free-floating trunk, four 3-hinge legs with joint anchors, foot
spheres, a ground plane — then imported onto the TPU-native engine
with :func:`nnx_ppo_tpu.envs.legged_from_mjcf` and trained with the
standard :class:`~nnx_ppo_tpu.envs.legged.LeggedJoystick` env.

Run: ``python examples/mjcf_import.py [--steps N]``
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    PPOConfig,
    TrainConfig,
    train_ppo,
)
from nnx_ppo_tpu.envs.legged import LeggedJoystick
from nnx_ppo_tpu.networks import (
    Concat,
    Dense,
    NormalTanhSampler,
    Parallel,
    PPOAdapter,
    Sequential,
    make_mlp,
)
from nnx_ppo_tpu.wrappers import EpisodeWrapper

# A Go1-class quadruped in ordinary MJCF idiom.
_LEG = """
      <body name="{leg}_hip" pos="{hx} {hy} 0">
        <joint name="{leg}_abd" type="hinge" axis="1 0 0" damping="2.0"
               armature="0.01"/>
        <inertial pos="0 {side_half} 0" mass="0.6"
                  diaginertia="0.0007 0.0007 0.0007"/>
        <body name="{leg}_thigh" pos="0 {side} 0">
          <joint name="{leg}_hip" type="hinge" axis="0 1 0" damping="2.0"
                 armature="0.01"/>
          <inertial pos="0 0 -0.1065" mass="0.9"
                    diaginertia="0.0035 0.0035 0.0002"/>
          <body name="{leg}_shank" pos="0 0 -0.213">
            <joint name="{leg}_knee" type="hinge" axis="0 1 0" damping="2.0"
                   armature="0.01"/>
            <inertial pos="0 0 -0.1065" mass="0.15"
                      diaginertia="0.0006 0.0006 0.00002"/>
            <geom name="{leg}_foot" type="sphere" size="0.022"
                  pos="0 0 -0.213" friction="0.8 0.005 0.0001"/>
          </body>
        </body>
      </body>
"""

QUADRUPED_MJCF = (
    """
<mujoco model="mjcf_quadruped">
  <option gravity="0 0 -9.81"/>
  <compiler angle="radian"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body name="trunk" pos="0 0 0.312">
      <freejoint/>
      <inertial pos="0 0 0" mass="5.2" diaginertia="0.024 0.064 0.072"/>
"""
    + "".join(
        _LEG.format(
            leg=leg,
            hx=hx,
            hy=hy,
            side=0.08 if hy > 0 else -0.08,
            side_half=0.04 if hy > 0 else -0.04,
        )
        for leg, (hx, hy) in {
            "FR": (0.19, -0.05),
            "FL": (0.19, 0.05),
            "RR": (-0.19, -0.05),
            "RL": (-0.19, 0.05),
        }.items()
    )
    + """
    </body>
  </worldbody>
  <actuator>
"""
    + "".join(
        f'    <position joint="{leg}_{j}" kp="60" kv="0"'
        f' ctrlrange="{lo} {hi}"/>\n'
        for leg in ("FR", "FL", "RR", "RL")
        for j, (lo, hi) in (
            ("abd", (-0.5, 0.5)),
            ("hip", (0.3, 1.3)),
            ("knee", (-2.1, -1.1)),
        )
    )
    + """
  </actuator>
</mujoco>
"""
)

# The MJCF declares the model at q = 0 (legs straight); the standing
# crouch is a joint configuration, passed as the env's default pose.
DEFAULT_POSE = np.array([0.0, 0.8, -1.6] * 4)


def make_env(**kwargs) -> LeggedJoystick:
    """Build the joystick env straight from the XML: kp and per-joint
    action scales come from the ``<position>`` actuators; the standing
    pose overrides the MJCF zero configuration."""
    from nnx_ppo_tpu.envs import legged_from_mjcf

    return legged_from_mjcf(
        QUADRUPED_MJCF,
        default_pose=DEFAULT_POSE,
        stand_height=0.312,
        **kwargs,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2_000_000)
    parser.add_argument("--n-envs", type=int, default=1024)
    args = parser.parse_args()

    env = EpisodeWrapper(make_env(reuse_mass_matrix=True), max_len=500)
    n_act = env.action_size
    proprio = env.observation_size["proprio"]
    k = jax.random.split(jax.random.key(0), 7)
    enc = Concat.create(
        proprio=Dense.create(proprio, 128, k[0], jax.nn.relu),
        command=Dense.create(3, 32, k[1], jax.nn.relu),
    )
    actor = Sequential.create(
        [
            Dense.create(160, 128, k[2], jax.nn.relu),
            Dense.create(128, 2 * n_act, k[3]),
            NormalTanhSampler.create(k[4], entropy_weight=1e-3),
        ]
    )
    critic = Parallel.create(
        tracking=make_mlp([160, 128, 1], k[5], activation_last_layer=False),
        penalty=make_mlp([160, 128, 1], k[6], activation_last_layer=False),
    )
    net = Sequential.create(
        [enc, PPOAdapter.create(action=actor, value=critic)]
    )
    cfg = TrainConfig(
        ppo=PPOConfig(
            n_envs=args.n_envs,
            rollout_length=20,
            total_steps=args.steps,
            combine_advantages=True,
        ),
        eval=EvalConfig(n_envs=256, logging_percentiles=None),
    )
    res = train_ppo(
        env,
        net,
        cfg,
        log_fn=lambda metrics, step: print(
            step,
            {
                k_: round(float(v), 3)
                for k_, v in metrics.items()
                if "episode_reward" in k_ or "lifespan_mean" in k_
            },
        ),
    )
    print("final eval:", res.eval_history[-1])


if __name__ == "__main__":
    main()
