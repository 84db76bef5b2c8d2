"""Quantify contact-model divergence from MuJoCo on a real robot.

The engine intentionally uses penalty/compliant contacts (spring-damper
normal + smooth-Coulomb friction, ``physics/engine.py:357``) where
MuJoCo solves constraint contacts (solref/solimp). The smooth dynamics
are cross-validated to float noise (``tests/test_mjcf.py``); this study
measures how far CONTACT trajectories drift on the gymnasium ant —
free base, 8 hinge legs, 4 capsule feet in sustained ground contact.

Protocol (VERDICT round-2 item 9):
  * Both engines integrate the identical model at dt=2 ms with the
    matching semi-implicit Euler scheme (MuJoCo ``mjINT_EULER`` — the
    same scheme the engine uses; the smooth part of the dynamics is
    already trajectory-exact, so drift is attributable to the contact
    model plus chaotic amplification).
  * Scenarios: (a) passive settle from a 5 cm drop, zero torque;
    (b) actuated — sinusoidal torques on all 8 leg hinges (contact-rich
    weight-shifting; legs stay on the ground).
  * Torques enter MuJoCo via ``qfrc_applied`` on the hinge dofs (the
    engine applies raw generalized torques; hinge dof layouts
    coincide — ``physics/mjcf.py:183``).
  * Reported: base-position RMS drift and joint-angle RMS drift at
    0.5 s and 2 s, next to a CHAOS FLOOR — MuJoCo vs itself from an
    initial state perturbed by 1e-5 rad. Contact-rich rigid-body
    dynamics are exponentially sensitive, so the floor shows how much
    of the drift ANY model difference (or a different machine's
    rounding) would produce; the meaningful signal is drift >> floor
    at short horizons.

Writes ``benchmarks/results/contact_divergence.csv`` (one row per
(scenario, series, t)) and prints a summary table. Runs on CPU in
~1 min; no TPU required.
"""

from __future__ import annotations

import csv
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import mujoco
import numpy as np

from nnx_ppo_tpu.physics.engine import step
from nnx_ppo_tpu.physics.mjcf import from_mjcf

_GYM_ASSETS = None
for cand in (
    "/opt/venv/lib/python3.12/site-packages/gymnasium/envs/mujoco/assets",
):
    if os.path.exists(f"{cand}/ant.xml"):
        _GYM_ASSETS = cand

DT = 0.002
HORIZON_S = 2.0
N_STEPS = int(HORIZON_S / DT)
DROP_HEIGHT = 0.05
REPORT_TIMES = (0.5, 2.0)

# Contact/limit settings from the standing-ant gate
# (tests/test_mjcf.py::test_imported_ant_stands) — scaled to the ant's
# ~0.9 kg mass so the penalty contacts are stiff but explicit-stable.
ENGINE_OVERRIDES = dict(
    contact_stiffness=800.0,
    contact_damping=30.0,
    max_contact_force=100.0,
    friction_vel=0.3,
    limit_stiffness=300.0,
    limit_damping=5.0,
)


def _mj_rollout(m, qpos0, qvel0, tau_fn, perturb=0.0):
    d = mujoco.MjData(m)
    d.qpos[:] = qpos0
    d.qpos[7:] += perturb
    d.qvel[:] = qvel0
    traj = np.empty((N_STEPS, m.nq))
    for t in range(N_STEPS):
        d.qfrc_applied[:] = 0.0
        d.qfrc_applied[6:] = tau_fn(t * DT)
        mujoco.mj_step(m, d)
        traj[t] = d.qpos
    return traj


def _engine_rollout(model, qpos0, qvel0, tau_fn):
    taus = jnp.asarray(
        np.stack([tau_fn(t * DT) for t in range(N_STEPS)]), jnp.float32
    )

    def body(carry, tau_joint):
        qp, qv = carry
        tau = jnp.zeros(model.nv).at[6:].set(tau_joint)
        qp, qv, _ = step(model, qp, qv, tau, DT, n_substeps=1)
        return (qp, qv), qp

    _, traj = jax.lax.scan(
        body,
        (jnp.asarray(qpos0, jnp.float32), jnp.asarray(qvel0, jnp.float32)),
        taus,
    )
    return np.asarray(jax.jit(lambda: traj)())


def _drift(traj_a, traj_b):
    """(pos_rms, joint_rms) time series between two qpos trajectories
    (identical engine/MuJoCo qpos layouts for this model)."""
    pos = np.linalg.norm(traj_a[:, :3] - traj_b[:, :3], axis=-1)
    joint = np.sqrt(np.mean((traj_a[:, 7:] - traj_b[:, 7:]) ** 2, axis=-1))
    return pos, joint


def main() -> None:
    if _GYM_ASSETS is None:
        raise SystemExit("gymnasium ant.xml not found")
    path = f"{_GYM_ASSETS}/ant.xml"
    imp = from_mjcf(path)
    model = dataclasses.replace(imp.model, **ENGINE_OVERRIDES)

    m = mujoco.MjModel.from_xml_path(path)
    m.opt.timestep = DT
    m.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER

    qpos0 = np.array(imp.qpos0)
    qpos0[2] += DROP_HEIGHT
    qvel0 = np.zeros(m.nv)
    n_joint = m.nv - 6

    def tau_zero(_t):
        return np.zeros(n_joint)

    def tau_sine(t):
        phase = np.arange(n_joint) * (np.pi / 4)
        return 1.5 * np.sin(2 * np.pi * 1.0 * t + phase)

    rows = []
    summary = {}
    for scenario, tau_fn in (("settle", tau_zero), ("actuated", tau_sine)):
        mj = _mj_rollout(m, qpos0, qvel0, tau_fn)
        eng = _engine_rollout(model, qpos0, qvel0, tau_fn)
        mj_pert = _mj_rollout(m, qpos0, qvel0, tau_fn, perturb=1e-5)
        pos, joint = _drift(eng, mj)
        floor_pos, floor_joint = _drift(mj_pert, mj)
        for series, p, j in (
            ("engine_vs_mujoco", pos, joint),
            ("mujoco_chaos_floor", floor_pos, floor_joint),
        ):
            for t_rep in REPORT_TIMES:
                i = int(t_rep / DT) - 1
                rows.append(
                    dict(
                        scenario=scenario,
                        series=series,
                        t_s=t_rep,
                        base_pos_rms_m=float(p[i]),
                        joint_angle_rms_rad=float(j[i]),
                    )
                )
                summary[(scenario, series, t_rep)] = (
                    float(p[i]),
                    float(j[i]),
                )

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results",
        "contact_divergence.csv",
    )
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    print(f"# gymnasium ant, dt={DT}, Euler both sides -> {out}")
    print(f"{'scenario':<10} {'series':<20} {'t':>5} "
          f"{'base_pos_rms_m':>16} {'joint_rms_rad':>15}")
    for (scenario, series, t_rep), (p, j) in summary.items():
        print(f"{scenario:<10} {series:<20} {t_rep:>4}s {p:>16.4f} {j:>15.4f}")


if __name__ == "__main__":
    main()
