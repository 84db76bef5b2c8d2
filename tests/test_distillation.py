"""Distillation tests (reference ``distillation_test.py`` strategy):
step + jit, loss finiteness, frozen-teacher invariance, and student
convergence toward the teacher."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.algorithms.config import (
    DistillationConfig,
    DistillationTrainConfig,
    EvalConfig,
    VideoConfig,
)
from nnx_ppo_tpu.algorithms.distillation import (
    distillation_step,
    new_distillation_state,
    train_distillation,
)
from nnx_ppo_tpu.algorithms.ppo import make_optimizer
from nnx_ppo_tpu.core.struct import partition_params
from nnx_ppo_tpu.networks import make_mlp_actor_critic
from nnx_ppo_tpu.test_dummies import MoveToCenterEnv
from nnx_ppo_tpu.wrappers import EpisodeWrapper


def make_pair():
    # initializer_scale > 1 gives the (untrained) teacher distinctive,
    # non-trivial action means for the student to match.
    teacher = make_mlp_actor_critic(
        2, 2, [16, 16], [16], jax.random.key(0), normalize_obs=False,
        entropy_weight=0.0, initializer_scale=3.0,
    ).eval()
    student = make_mlp_actor_critic(
        2, 2, [16, 16], [16], jax.random.key(99), normalize_obs=False,
        entropy_weight=0.0,
    )
    return teacher, student


CFG = DistillationConfig(n_envs=8, rollout_length=5, n_epochs=2, n_minibatches=2)


class TestDistillationStep:
    def test_jit_step_and_finiteness(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        teacher, student = make_pair()
        state = new_distillation_state(env, teacher, student, CFG.n_envs, seed=0)
        opt = make_optimizer(CFG.learning_rate)
        step = jax.jit(
            functools.partial(
                distillation_step, env, teacher, config=CFG, optimizer=opt
            )
        )
        for i in range(2):
            state, metrics = step(state)
        assert jnp.isfinite(metrics["losses/distillation_nll/mean"])
        assert int(state.steps_taken) == 2 * CFG.n_envs * CFG.rollout_length

    def test_unshuffled_minibatches(self):
        """``shuffle_minibatches=False`` (contiguous-slice minibatching,
        mirroring PPOConfig) runs with finite losses and the same step
        accounting."""
        import dataclasses

        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        teacher, student = make_pair()
        cfg = dataclasses.replace(CFG, shuffle_minibatches=False)
        state = new_distillation_state(env, teacher, student, cfg.n_envs,
                                       seed=0)
        opt = make_optimizer(cfg.learning_rate)
        step = jax.jit(
            functools.partial(
                distillation_step, env, teacher, config=cfg, optimizer=opt
            )
        )
        state, metrics = step(state)
        assert jnp.isfinite(metrics["losses/distillation_nll/mean"])
        assert int(state.steps_taken) == cfg.n_envs * cfg.rollout_length

    def test_teacher_unchanged_student_changes(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        teacher, student = make_pair()
        state = new_distillation_state(env, teacher, student, CFG.n_envs, seed=0)
        opt = make_optimizer(CFG.learning_rate)
        step = jax.jit(
            functools.partial(
                distillation_step, env, teacher, config=CFG, optimizer=opt
            )
        )
        s_params0, _ = partition_params(state.student)
        new_state, _ = step(state)
        s_params1, _ = partition_params(new_state.student)
        deltas = [
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree.leaves(s_params0), jax.tree.leaves(s_params1))
        ]
        assert max(deltas) > 0  # student learns
        # Teacher is an external static arg — by construction untouched;
        # check its buffers are still alive and intact.
        t_params, _ = partition_params(teacher)
        for leaf in jax.tree.leaves(t_params):
            assert jnp.isfinite(leaf).all()

    def test_student_approaches_teacher(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 100)
        teacher, student = make_pair()
        cfg = DistillationTrainConfig(
            distillation=DistillationConfig(
                n_envs=32, rollout_length=8, total_steps=60_000,
                learning_rate=1e-3, n_epochs=2, n_minibatches=2,
            ),
            eval=EvalConfig(enabled=False),
            video=VideoConfig(enabled=False),
        )
        res = train_distillation(env, teacher, student, cfg)
        trained = res.training_state.student.eval()

        # Compare deterministic actions of teacher vs trained student.
        obs = jax.random.normal(jax.random.key(5), (64, 2)) * 0.3
        t_eval = teacher.eval()
        t_actions = t_eval(t_eval.initialize_state(64), obs).output.actions
        s_actions = trained(trained.initialize_state(64), obs).output.actions
        before = student.eval()
        b_actions = before(before.initialize_state(64), obs).output.actions
        err_after = float(jnp.abs(t_actions - s_actions).mean())
        err_before = float(jnp.abs(t_actions - b_actions).mean())
        assert err_after < err_before * 0.6, (err_before, err_after)


class TestTrainDistillation:
    def test_full_loop(self):
        env = EpisodeWrapper(MoveToCenterEnv(), 50)
        teacher, student = make_pair()
        cfg = DistillationTrainConfig(
            distillation=DistillationConfig(
                n_envs=8, rollout_length=4, total_steps=96,
                n_epochs=1, n_minibatches=1,
            ),
            eval=EvalConfig(n_envs=4, max_episode_length=10, every_steps=64),
            video=VideoConfig(enabled=False),
        )
        logs = []
        res = train_distillation(
            env, teacher, student, cfg, log_fn=lambda m, s: logs.append(s)
        )
        assert res.total_steps >= 96
        assert len(res.eval_history) >= 2
