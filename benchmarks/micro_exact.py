"""Component timings for the exact-dynamics physics path on TPU.

The suite shows held-factor (fastM) configs at ~3.3M env-steps/s while
exact-dynamics configs sit at ~75k — a 44x gap, where naive accounting
(the SAME mass-matrix + factorization work, just 10x per control step
instead of 1x) predicts ~10x. This script times the individual
components the exact substep chains together, on the live backend, to
localize the superlinearity before optimizing anything.

Usage: python benchmarks/micro_exact.py            # live backend
       JAX_PLATFORMS=cpu python benchmarks/micro_exact.py

Prints one JSON line per component: {"component", "ms", "B", ...}.
All timings use forced scalar readouts (this tunneled runtime's
block_until_ready has been observed returning early —
docs/performance.md).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# The image's site hook force-selects the tunneled TPU at `import jax`,
# stomping JAX_PLATFORMS; re-assert the caller's choice.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from nnx_ppo_tpu.ops.linalg import (
    cholesky_backsub,
    cholesky_factor_blocked,
    cholesky_solve_small,
)
from nnx_ppo_tpu.physics import engine, engine_depthwise as dw
from nnx_ppo_tpu.physics.models import make_quadruped
from nnx_ppo_tpu.physics.models import quadruped as qd

B = 2048
DT = 0.002
WARMUP, ITERS = 3, 30


def bench(name, fn, *args, **extra):
    """Time jit(fn) over ITERS calls with a forced scalar readout."""
    f = jax.jit(fn)
    out = f(*args)
    for _ in range(WARMUP):
        out = f(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])  # barrier
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    float(jax.tree.leaves(out)[0].ravel()[0])
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(json.dumps({"component": name, "ms": round(ms, 4), "B": B,
                      **extra}), flush=True)
    return ms


def main():
    model = make_quadruped()
    plan = dw.DepthPlan.build(model)
    k1, k2 = jax.random.split(jax.random.key(0))
    base = jnp.asarray(qd.default_qpos(model))
    qpos = jnp.tile(base, (B, 1)).at[:, 7:].add(
        0.1 * jax.random.normal(k1, (B, model.nj)))
    qvel = 0.3 * jax.random.normal(k2, (B, model.nv))
    tau = jnp.zeros((B, model.nv)).at[:, 6:].set(1.0)
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "device": str(jax.devices()[0])}), flush=True)

    # Mass-matrix assembly, both engines.
    mm_dw = jax.vmap(lambda q: dw.mass_matrix_dw(model, plan, q))
    mm_gen = jax.vmap(
        lambda q: engine.mass_matrix(model, engine.fwd_kinematics(model, q))
    )
    bench("mass_matrix_dw", mm_dw, qpos)
    bench("mass_matrix_generic", mm_gen, qpos)

    M = mm_dw(qpos) + DT * jnp.diag(
        jnp.asarray(model.damping, jnp.float32))

    # Factor / solve primitives on [B, 18, 18].
    bench("cholesky_factor_blocked", cholesky_factor_blocked, M)
    L = cholesky_factor_blocked(M)
    bench("cholesky_backsub", cholesky_backsub, L, tau)
    bench("cholesky_solve_small", cholesky_solve_small, M, tau)

    # One full forward-dynamics call, each variant.
    minv = jax.vmap(
        lambda q: dw.mass_matrix_inverse_dw(model, plan, q, dt=DT)
    )(qpos)
    chol = jax.vmap(
        lambda q: engine.mass_matrix_factor(model, q, dt=DT)
    )(qpos)

    fd_dw_exact = jax.vmap(
        lambda qp, qv, t: dw.forward_dynamics_dw(
            model, plan, qp, qv, t, dt=DT)[0])
    fd_dw_fast = jax.vmap(
        lambda qp, qv, t, mi: dw.forward_dynamics_dw(
            model, plan, qp, qv, t, dt=DT, minv=mi)[0])
    fd_gen_exact = jax.vmap(
        lambda qp, qv, t: engine.forward_dynamics(
            model, qp, qv, t, dt=DT)[0])
    fd_gen_fast = jax.vmap(
        lambda qp, qv, t, L_: engine.forward_dynamics(
            model, qp, qv, t, dt=DT, chol=L_)[0])
    bench("forward_dynamics_dw_exact", fd_dw_exact, qpos, qvel, tau)
    bench("forward_dynamics_dw_fastM", fd_dw_fast, qpos, qvel, tau, minv)
    bench("forward_dynamics_generic_exact", fd_gen_exact, qpos, qvel, tau)
    bench("forward_dynamics_generic_fastM", fd_gen_fast, qpos, qvel, tau,
          chol)

    # Scan of 10 substeps — the shape the env actually compiles. If the
    # scan is much worse than 10x a single call, the pathology is in
    # scheduling/live-ranges, not the math.
    def scan10(fd):
        def body(qp, qv, t):
            def sub(c, _):
                qp_, qv_ = c
                qacc = fd(qp_, qv_, t)
                qp2, qv2 = engine.integrate(model, qp_, qv_, qacc, DT)
                return (qp2, qv2), None
            (qp, qv), _ = jax.lax.scan(sub, (qp, qv), None, length=10)
            return qv
        return jax.vmap(body)

    bench("scan10_dw_exact", scan10(
        lambda qp, qv, t: dw.forward_dynamics_dw(
            model, plan, qp, qv, t, dt=DT)[0]), qpos, qvel, tau)
    bench("scan10_generic_exact", scan10(
        lambda qp, qv, t: engine.forward_dynamics(
            model, qp, qv, t, dt=DT)[0]), qpos, qvel, tau)

    def scan10_fast(qp, qv, t):
        mi = dw.mass_matrix_inverse_dw(model, plan, qp, dt=DT)

        def sub(c, _):
            qp_, qv_ = c
            qacc = dw.forward_dynamics_dw(
                model, plan, qp_, qv_, t, dt=DT, minv=mi)[0]
            return engine.integrate(model, qp_, qv_, qacc, DT), None

        (qp, qv), _ = jax.lax.scan(sub, (qp, qv), None, length=10)
        return qv

    bench("scan10_dw_fastM_heldinv", jax.vmap(scan10_fast), qpos, qvel,
          tau)


if __name__ == "__main__":
    main()
