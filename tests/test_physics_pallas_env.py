"""The Pallas substep path must be reachable from the real env
(``LeggedJoystick(substep_impl='pallas')``) and exactly reproduce the
XLA fast path through the full vmapped ``env.step`` — states, rewards,
AND metrics (the foot normals come out of the kernel itself).

Runs the kernel in interpret mode on CPU (platform-independent); on a
real TPU the same dispatch compiles the Mosaic kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnx_ppo_tpu.envs import QuadrupedJoystick


def _batched_states(env, batch: int, key):
    return jax.vmap(env.reset)(jax.random.split(key, batch))


@pytest.mark.parametrize(
    "features",
    [
        dict(),
        pytest.param(
            dict(self_collision=True, joint_limits=True),
            marks=pytest.mark.slow,  # second interpret-mode run; the
            # full-feature exactness gate lives in test_physics_soa
        ),
    ],
    ids=["base", "full"],
)
def test_env_pallas_matches_xla_fast_path(features):
    # n_substeps trimmed from the 10-substep default: interpret-mode
    # Pallas executes lane-by-lane on the host, and 3 substeps already
    # cross the contact/swing regimes the parity needs to cover.
    B, T = 8, 3
    ref_env = QuadrupedJoystick(
        reuse_mass_matrix=True, depthwise=False, substep_impl="xla",
        n_substeps=3, **features,
    )
    pl_env = QuadrupedJoystick(
        reuse_mass_matrix=True, substep_impl="pallas", n_substeps=3,
        **features,
    )
    key = jax.random.key(0)
    ref_state = _batched_states(ref_env, B, key)
    pl_state = _batched_states(pl_env, B, key)
    actions = 0.3 * jax.random.normal(
        jax.random.key(1), (T, B, ref_env.action_size)
    )

    ref_step = jax.jit(jax.vmap(ref_env.step))
    pl_step = jax.jit(jax.vmap(pl_env.step))
    for t in range(T):
        ref_state = ref_step(ref_state, actions[t])
        pl_state = pl_step(pl_state, actions[t])

    np.testing.assert_allclose(
        np.asarray(pl_state.data["qpos"]),
        np.asarray(ref_state.data["qpos"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pl_state.data["qvel"]),
        np.asarray(ref_state.data["qvel"]),
        rtol=2e-3, atol=2e-3,
    )
    for k in ref_state.reward:
        np.testing.assert_allclose(
            np.asarray(pl_state.reward[k]),
            np.asarray(ref_state.reward[k]),
            rtol=1e-3, atol=1e-3,
        )
    # Foot-contact metrics come from the kernel's normals output.
    np.testing.assert_allclose(
        np.asarray(pl_state.metrics["contact_force"]),
        np.asarray(ref_state.metrics["contact_force"]),
        rtol=5e-3, atol=5e-2,
    )
    np.testing.assert_array_equal(
        np.asarray(pl_state.metrics["foot_contacts"]),
        np.asarray(ref_state.metrics["foot_contacts"]),
    )


@pytest.mark.parametrize("held", [True, False], ids=["heldM", "exactM"])
def test_env_pallas_matches_xla_production_features(held):
    """The production-realism feature set — per-env domain
    randomization (all four scalar fields), random trunk pushes, and
    rough analytic terrain — must ride the megakernel path and exactly
    reproduce the XLA path through the env. This is the round-4 cliff
    closure: these features previously fell off the kernel onto
    exact-XLA (docs/physics.md)."""
    from nnx_ppo_tpu.physics import DomainRandomization
    from nnx_ppo_tpu.physics.terrain import rough_terrain

    feat = dict(
        randomize=DomainRandomization(damping_scale=(0.8, 1.2)),
        push_prob=0.5,
        push_force=40.0,
        terrain=rough_terrain(seed=3),
        n_substeps=3 if held else 2,
    )
    B, T = 8, 3 if held else 2
    ref_env = QuadrupedJoystick(
        reuse_mass_matrix=held, depthwise=False, substep_impl="xla",
        **feat,
    )
    pl_env = QuadrupedJoystick(
        reuse_mass_matrix=held, substep_impl="pallas", **feat
    )
    assert pl_env._control_runner is not None
    assert pl_env._dr_fields == (
        "mass_scale", "friction", "damping_scale", "gain_scale"
    )
    key = jax.random.key(0)
    ref_state = _batched_states(ref_env, B, key)
    pl_state = _batched_states(pl_env, B, key)
    actions = 0.3 * jax.random.normal(
        jax.random.key(1), (T, B, ref_env.action_size)
    )
    ref_step = jax.jit(jax.vmap(ref_env.step))
    pl_step = jax.jit(jax.vmap(pl_env.step))
    for t in range(T):
        ref_state = ref_step(ref_state, actions[t])
        pl_state = pl_step(pl_state, actions[t])
    np.testing.assert_allclose(
        np.asarray(pl_state.data["qpos"]),
        np.asarray(ref_state.data["qpos"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pl_state.data["qvel"]),
        np.asarray(ref_state.data["qvel"]),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(pl_state.metrics["contact_force"]),
        np.asarray(ref_state.metrics["contact_force"]),
        rtol=5e-3, atol=5e-2,
    )


def test_env_pallas_unbatched_step():
    """Unbatched env.step (the render-rollout path) runs the scalar-lane
    primal, no Pallas launch needed."""
    env = QuadrupedJoystick(
        reuse_mass_matrix=True, substep_impl="pallas", n_substeps=2
    )
    state = env.reset(jax.random.key(0))
    nxt = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    assert jnp.isfinite(nxt.data["qpos"]).all()
    assert nxt.metrics["foot_contacts"] >= 0


@pytest.mark.parametrize(
    "kwargs,match",
    [
        (
            # The legacy factor-passed-in kernel still needs the held
            # factor; only the in-kernel-factor runner supports exact.
            dict(pallas_in_kernel_factor=False),
            "reuse_mass_matrix",
        ),
        (
            # The legacy kernel also predates the feature lanes: DR
            # must be refused there (the in-kernel-factor runner is
            # the supported path for it).
            dict(
                reuse_mass_matrix=True, pallas_in_kernel_factor=False,
                randomize="DR",
            ),
            "DR overrides",
        ),
    ],
)
def test_env_pallas_refuses_unsupported(kwargs, match):
    if kwargs.get("randomize") == "DR":
        from nnx_ppo_tpu.physics import DomainRandomization

        kwargs["randomize"] = DomainRandomization(mass_scale=(0.9, 1.1))
    with pytest.raises(ValueError, match=match):
        QuadrupedJoystick(substep_impl="pallas", **kwargs)


def test_env_pallas_exact_matches_xla_exact_path():
    """Without ``reuse_mass_matrix`` the in-kernel-factor runner
    refactors every substep — exact dynamics. Must reproduce the XLA
    exact path (per-substep CRBA + solve) through the env."""
    B, T = 8, 2
    ref_env = QuadrupedJoystick(
        depthwise=False, substep_impl="xla", n_substeps=3
    )
    pl_env = QuadrupedJoystick(substep_impl="pallas", n_substeps=3)
    assert pl_env._control_runner is not None
    key = jax.random.key(0)
    ref_state = _batched_states(ref_env, B, key)
    pl_state = _batched_states(pl_env, B, key)
    actions = 0.3 * jax.random.normal(
        jax.random.key(1), (T, B, ref_env.action_size)
    )
    ref_step = jax.jit(jax.vmap(ref_env.step))
    pl_step = jax.jit(jax.vmap(pl_env.step))
    for t in range(T):
        ref_state = ref_step(ref_state, actions[t])
        pl_state = pl_step(pl_state, actions[t])
    np.testing.assert_allclose(
        np.asarray(pl_state.data["qpos"]),
        np.asarray(ref_state.data["qpos"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pl_state.data["qvel"]),
        np.asarray(ref_state.data["qvel"]),
        rtol=2e-3, atol=2e-3,
    )


def test_env_auto_builds_runner_but_stays_xla_on_cpu():
    """'auto' prepares the megakernel runner for supported configs but
    does not engage it off-TPU (the depthwise XLA path wins on CPU)."""
    env = QuadrupedJoystick(reuse_mass_matrix=True)  # substep_impl='auto'
    assert env._control_runner is not None  # in-kernel-factor default
    # The legacy XLA-side-factor kernel stays reachable via the knob.
    env_legacy = QuadrupedJoystick(
        reuse_mass_matrix=True, pallas_in_kernel_factor=False
    )
    assert env_legacy._substep_runner is not None
    assert env_legacy._control_runner is None
    # The full contact feature set is in the SoA kernel's scope too.
    env_full = QuadrupedJoystick(
        reuse_mass_matrix=True, joint_limits=True, self_collision=True
    )
    assert env_full._control_runner is not None
    # Production-realism features build the in-kernel-factor runner
    # too: they are extra input lanes, not path disqualifiers.
    from nnx_ppo_tpu.physics import DomainRandomization
    from nnx_ppo_tpu.physics.terrain import rough_terrain

    env2 = QuadrupedJoystick(
        reuse_mass_matrix=True,
        randomize=DomainRandomization(mass_scale=(0.9, 1.1)),
        terrain=rough_terrain(),
        push_prob=0.05, push_force=30.0,
    )
    assert env2._control_runner is not None
    assert env2._dr_fields == ("mass_scale", "friction", "gain_scale")
    assert env2._kernel_push
    # Grid heightfields ride the kernel too (in-kernel tangent-plane
    # sampling — tests/test_heightgrid_kernel.py).
    import numpy as np_

    from nnx_ppo_tpu.physics.terrain import HeightGrid

    env3 = QuadrupedJoystick(
        reuse_mass_matrix=True,
        terrain=HeightGrid(
            data=np_.zeros((4, 4)), x0=-1.0, y0=-1.0, dx=0.5, dy=0.5
        ),
    )
    assert env3._control_runner is not None
    # Off-TPU, a step through 'auto' must take the XLA path and stay
    # finite (dispatch is trace-time on jax.default_backend()).
    state = jax.vmap(env.reset)(jax.random.split(jax.random.key(0), 4))
    nxt = jax.jit(jax.vmap(env.step))(state, jnp.zeros((4, env.action_size)))
    assert jnp.isfinite(nxt.data["qpos"]).all()


def test_pick_tile_prefers_large_lanes():
    """Lane-tile selection: largest divisor under the VMEM estimate —
    tile=256 puts only a quarter vreg behind each of the kernel's ~30k
    lane instructions; production batches should get >= 1024."""
    from nnx_ppo_tpu.physics.pallas_step import _pick_tile
    from nnx_ppo_tpu.physics.models import make_humanoid, make_quadruped

    q, h = make_quadruped(), make_humanoid()
    assert _pick_tile(2048, q) == 2048
    assert _pick_tile(8192, h) == 2048
    assert _pick_tile(128, q) == 128
    assert _pick_tile(100, q) is None  # not lane-divisible


def test_deep_chain_cold_compile_warning():
    """The humanoid-class (chain depth >= 4) megakernel with terrain +
    DR lanes measured a ~30-minute cold Mosaic compile; constructing
    that combination must warn with the mitigations, while the
    (shallower) quadruped must not."""
    import warnings

    from nnx_ppo_tpu.envs import HumanoidJoystick
    from nnx_ppo_tpu.physics import DomainRandomization, rough_terrain

    kw = dict(
        reuse_mass_matrix=True,
        randomize=DomainRandomization(mass_scale=(0.9, 1.1)),
        terrain=rough_terrain(),
        push_prob=0.02,
        push_force=50.0,
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        HumanoidJoystick(**kw)
    assert any("Mosaic compile" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        QuadrupedJoystick(**kw)
    assert not any("Mosaic compile" in str(x.message) for x in w)
