"""Video pipeline: render rollout → unstack → env.render → video_fn,
end-to-end through train_ppo (reference ``ppo.py:143-167`` path)."""

import jax

from nnx_ppo_tpu.algorithms import (
    EvalConfig,
    PPOConfig,
    TrainConfig,
    VideoConfig,
    train_ppo,
)
from nnx_ppo_tpu.envs import CartpoleBalance
from nnx_ppo_tpu.networks import make_mlp_actor_critic
from nnx_ppo_tpu.wrappers import EpisodeWrapper, RewardScalingWrapper


def test_video_pipeline_end_to_end():
    videos = []
    env = EpisodeWrapper(CartpoleBalance(), max_len=60)
    net = make_mlp_actor_critic(5, 1, [16], [16], jax.random.key(0))
    cfg = TrainConfig(
        ppo=PPOConfig(n_envs=8, rollout_length=5, total_steps=400),
        eval=EvalConfig(enabled=False),
        video=VideoConfig(
            enabled=True,
            every_steps=200,
            episode_length=30,
            render_kwargs=(("height", 120), ("width", 160)),
        ),
    )
    train_ppo(env, net, cfg, video_fn=videos.append)
    assert videos
    # T+1 frames: trajectory plus the appended final state.
    assert videos[0].frames.shape == (31, 120, 160, 3)
    assert videos[0].frames.dtype.name == "uint8"
    assert isinstance(videos[0].episode_reward, float)


def test_wrappers_delegate_render():
    env = RewardScalingWrapper(
        EpisodeWrapper(CartpoleBalance(), max_len=10), reward_scale=2.0
    )
    assert hasattr(env, "render")
    assert env.observation_size == 5


def test_quadruped_video_pipeline():
    """The physics envs complete the render path: render-rollout scan →
    unstack → LeggedJoystick.render → frames."""
    import numpy as np

    from nnx_ppo_tpu.algorithms import rollout
    from nnx_ppo_tpu.envs import QuadrupedJoystick
    from nnx_ppo_tpu.networks import make_mlp_actor_critic
    from nnx_ppo_tpu.networks.utils import Flattener
    from nnx_ppo_tpu.networks import Sequential
    from nnx_ppo_tpu.wrappers import EpisodeWrapper

    env = EpisodeWrapper(QuadrupedJoystick(), 100)
    net = Sequential.create([
        Flattener.create(),
        make_mlp_actor_critic(45, 12, [16], [16], jax.random.key(0),
                              normalize_obs=False),
    ])
    T = 5
    stacked, final, reward = jax.jit(
        lambda key: rollout.eval_rollout_for_render_scan(env, net, T, key)
    )(jax.random.key(1))
    trajectory = rollout.unstack_trajectory(stacked, final, T)
    frames = env.render(trajectory, height=80, width=120)
    assert len(frames) == T + 1
    assert frames[0].shape == (80, 120, 3)
    assert frames[0].dtype == np.uint8
    # Robot pixels present (not a blank frame).
    assert (frames[0] != 255).any()


def test_reacher_video_pipeline():
    """The manipulation env completes the render path: render-rollout
    scan → unstack → ArmReacher.render → frames with arm + target."""
    import numpy as np

    from nnx_ppo_tpu.algorithms import rollout
    from nnx_ppo_tpu.envs import ArmReacher
    from nnx_ppo_tpu.networks import make_mlp_actor_critic
    from nnx_ppo_tpu.wrappers import EpisodeWrapper

    env = EpisodeWrapper(ArmReacher(), 100)
    net = make_mlp_actor_critic(18, 4, [16], [16], jax.random.key(0))
    T = 5
    stacked, final, reward = jax.jit(
        lambda key: rollout.eval_rollout_for_render_scan(env, net, T, key)
    )(jax.random.key(1))
    trajectory = rollout.unstack_trajectory(stacked, final, T)
    frames = env.render(trajectory, height=80, width=120)
    assert len(frames) == T + 1
    assert frames[0].shape == (80, 120, 3)
    assert frames[0].dtype == np.uint8
    assert (frames[0] != 255).any()  # arm and target drawn


def test_pusher_video_pipeline():
    """The object-interaction env completes the render path:
    render-rollout scan → unstack → ArmPush.render → top-down frames
    with arm, ball, and target."""
    import numpy as np

    from nnx_ppo_tpu.algorithms import rollout
    from nnx_ppo_tpu.envs import ArmPush
    from nnx_ppo_tpu.networks import make_mlp_actor_critic
    from nnx_ppo_tpu.wrappers import EpisodeWrapper

    env = EpisodeWrapper(ArmPush(), 100)
    net = make_mlp_actor_critic(22, 4, [16], [16], jax.random.key(0))
    T = 4
    stacked, final, reward = jax.jit(
        lambda key: rollout.eval_rollout_for_render_scan(env, net, T, key)
    )(jax.random.key(1))
    trajectory = rollout.unstack_trajectory(stacked, final, T)
    frames = env.render(trajectory, height=80, width=120)
    assert len(frames) == T + 1
    assert frames[0].shape == (80, 120, 3)
    assert frames[0].dtype == np.uint8
    assert (frames[0] != 255).any()  # arm, ball, target drawn
    # The green ball disk is present.
    assert (frames[0] == np.array([80, 140, 60])).all(axis=-1).any()


def test_rough_terrain_video_profile():
    """LeggedJoystick.render draws the terrain profile (not the flat
    ground line) when a terrain is set."""
    import numpy as np

    from nnx_ppo_tpu.algorithms import rollout
    from nnx_ppo_tpu.envs import QuadrupedJoystick
    from nnx_ppo_tpu.networks import Sequential, make_mlp_actor_critic
    from nnx_ppo_tpu.networks.utils import Flattener
    from nnx_ppo_tpu.physics import rough_terrain
    from nnx_ppo_tpu.wrappers import EpisodeWrapper

    env = EpisodeWrapper(
        QuadrupedJoystick(
            terrain=rough_terrain(seed=2, amplitude=0.05, wavelength=1.0)
        ),
        100,
    )
    net = Sequential.create([
        Flattener.create(),
        make_mlp_actor_critic(45, 12, [16], [16], jax.random.key(0),
                              normalize_obs=False),
    ])
    T = 2
    stacked, final, _ = jax.jit(
        lambda key: rollout.eval_rollout_for_render_scan(env, net, T, key)
    )(jax.random.key(1))
    trajectory = rollout.unstack_trajectory(stacked, final, T)
    frames = env.render(trajectory, height=80, width=120)
    f = frames[0]
    assert f.shape == (80, 120, 3)
    # Ground pixels (value 110) exist and do NOT form a single flat
    # row: the profile spans multiple rows for a bumpy field.
    ground_rows = np.unique(np.where((f == 110).all(axis=-1))[0])
    assert len(ground_rows) > 2, ground_rows
