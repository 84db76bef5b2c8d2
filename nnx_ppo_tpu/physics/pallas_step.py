"""Pallas TPU megakernel for the legged-robot physics substeps.

One ``pallas_call`` executes the substeps of a control step for a tile
of environments, with every intermediate held in VMEM/registers: the
~200 small sequential XLA kernels per substep (the measured bottleneck
of the physics rollout — see ``docs/physics.md``) collapse into a
single fused program per tile. The math body is the SoA substep
(``engine_soa.py``), exactness-tested against the generic engine; this
module only adds the lane plumbing.

Layout: host arrays are env-major ``[B, k]``; the kernel wants
lane-major ``[k, B]`` so each scalar-of-the-computation is a ``[TILE]``
lane vector. The transposes happen once per control step (tiny next to
the 10 fused substeps). The Cholesky factor of ``M + dt·D`` is computed
OUTSIDE (existing XLA path, once per control step — the
``reuse_mass_matrix`` semantics) and passed in packed lower-triangular
form.

:func:`make_substep_runner` wraps the kernel in a
``jax.custom_batching.custom_vmap`` so a per-env ``env.step`` keeps its
unbatched semantics (the SoA math on scalar lanes) while the
framework's ``jax.vmap(env.step)`` dispatches the whole env batch into
the megakernel — the TPU-native answer to "the hot path is batched but
the protocol is per-env".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnx_ppo_tpu.physics.engine_soa import crba_chol_soa, substep_soa
from nnx_ppo_tpu.physics.model import Model


def _tri_indices(nv: int):
    return [(i, j) for i in range(nv) for j in range(i + 1)]


def pallas_substeps(
    model: Model,
    qpos: jax.Array,  # [B, nq]
    qvel: jax.Array,  # [B, nv]
    target: jax.Array,  # [B, nj]
    chol: jax.Array,  # [B, nv, nv] lower factor of M + dt·D
    kp: float,
    dt: float,
    n_substeps: int,
    tile: int = 256,
    interpret: bool = False,
    substeps_per_kernel: int = 1,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Run ``n_substeps`` physics substeps through the Pallas kernel.

    The kernel executes ``substeps_per_kernel`` fused substeps per
    launch; ``n_substeps`` must be a multiple. The default of 1 keeps
    the Mosaic program small (observed: an in-kernel ``fori_loop`` over
    10 substeps wedges the remote Mosaic compile on the tunneled v5e,
    while the single-substep body compiles in seconds) — even at 1, a
    control step is 10 kernel launches instead of the ~2000 XLA kernels
    of the vmapped generic engine.

    Returns ``(qpos', qvel', normals)`` with env-major layouts; normals
    ``[B, n_geoms]`` are the contact normal forces of the LAST substep
    (pre-integration state, matching the generic engine's scan output).
    """
    from jax.experimental import pallas as pl

    B = qpos.shape[0]
    nq, nv, nj = model.nq, model.nv, model.nj
    # Normals output: ground-geom normals first, then the collision
    # pairs in declaration order (the generic engine's layout).
    n_geoms = len(model.geom_body) + len(model.pair_geom_a)
    if B % tile != 0:
        raise ValueError(f"batch {B} not divisible by tile {tile}")
    if n_substeps % substeps_per_kernel != 0:
        raise ValueError("n_substeps must be a multiple of substeps_per_kernel")
    tri = _tri_indices(nv)

    qpos_t = qpos.T  # [nq, B]
    qvel_t = qvel.T
    target_t = target.T
    chol_packed = jnp.stack([chol[:, i, j] for (i, j) in tri])  # [n_tri, B]

    def kernel(qpos_ref, qvel_ref, target_ref, chol_ref,
               qpos_out, qvel_out, normals_out):
        qp = tuple(qpos_ref[k, :] for k in range(nq))
        qv = tuple(qvel_ref[k, :] for k in range(nv))
        tgt = tuple(target_ref[k, :] for k in range(nj))
        rows = [[None] * (i + 1) for i in range(nv)]
        for idx, (i, j) in enumerate(tri):
            rows[i][j] = chol_ref[idx, :]
        chol_lanes = tuple(tuple(r) for r in rows)

        normals = None
        for _ in range(substeps_per_kernel):
            qp, qv, normals = substep_soa(model, qp, qv, tgt, chol_lanes,
                                          kp, dt)
        for k in range(nq):
            qpos_out[k, :] = qp[k]
        for k in range(nv):
            qvel_out[k, :] = qv[k]
        for k in range(n_geoms):
            normals_out[k, :] = normals[k]

    grid = (B // tile,)

    def spec(k):
        return pl.BlockSpec((k, tile), lambda i: (0, i))

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(nq), spec(nv), spec(nj), spec(len(tri))],
        out_specs=[spec(nq), spec(nv), spec(n_geoms)],
        out_shape=[
            jax.ShapeDtypeStruct((nq, B), jnp.float32),
            jax.ShapeDtypeStruct((nv, B), jnp.float32),
            jax.ShapeDtypeStruct((n_geoms, B), jnp.float32),
        ],
        interpret=interpret,
    )

    qpos_t = qpos_t.astype(jnp.float32)
    qvel_t = qvel_t.astype(jnp.float32)
    target_t = target_t.astype(jnp.float32)
    chol_packed = chol_packed.astype(jnp.float32)
    normals_t = None
    for _ in range(n_substeps // substeps_per_kernel):
        qpos_t, qvel_t, normals_t = call(qpos_t, qvel_t, target_t,
                                         chol_packed)
    return qpos_t.T, qvel_t.T, normals_t.T


def _split_extra(extra_lanes, dr_fields, has_push, n_terrain_planes=0):
    """Unpack the packed per-env extras (DR scalars, then the 3 push
    lanes, then 3 tangent-plane lanes ``(c, gx, gy)`` per ground geom —
    produced by :func:`pallas_plane_sampler` for HeightGrid terrain)
    into (substep kwargs, crba kwargs). ``extra_lanes`` indexes lanes:
    ``extra_lanes[k]`` — a ref row inside the kernel, a scalar inside
    the per-env primal."""
    sub_kw = {}
    for i, name in enumerate(dr_fields):
        sub_kw[name] = extra_lanes[i]
    n = len(dr_fields)
    if has_push:
        sub_kw["push"] = tuple(extra_lanes[n + k] for k in range(3))
        n += 3
    if n_terrain_planes:
        sub_kw["terrain_planes"] = tuple(
            tuple(extra_lanes[n + 3 * g + k] for k in range(3))
            for g in range(n_terrain_planes)
        )
    crba_kw = {
        k: v
        for k, v in sub_kw.items()
        if k in ("mass_scale", "damping_scale")
    }
    return sub_kw, crba_kw


def _heightgrid_planes(grid, table, model, qp):
    """Frozen per-control-step tangent planes of a HeightGrid at each
    geom's world xy (``engine_soa.heightgrid_planes_soa`` — one-hot MXU
    dots; Mosaic has no gather, and XLA-side gathers measured ~0.9 ms
    per control step on a v5e). Returns the per-geom (c, gx, gy) lane
    triples for ``substep_soa(terrain_planes=...)``."""
    from nnx_ppo_tpu.physics.engine_soa import (
        _kin_soa,
        heightgrid_planes_soa,
    )

    E, P, _, _, _ = _kin_soa(model, qp)
    return heightgrid_planes_soa(grid, table, model, E, P)


def pallas_plane_sampler(
    model: Model,
    grid,
    qpos: jax.Array,  # [B, nq]
    table: jax.Array,  # [nx, ny]
    tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Dedicated kernel: FK + HeightGrid tangent-plane sampling for all
    ground geoms → ``[B, 3·n_geoms]`` packed ``(c, gx, gy)`` lanes.

    Kept SEPARATE from the physics megakernel on purpose: folding the
    per-geom one-hot table dots into the 10-substep physics program
    made the remote Mosaic compile helper OOM (SIGKILL at tile 2048 AND
    512), while this small kernel (one kinematics pass + 2 MXU dots per
    geom) compiles in seconds and launches once per control step.
    """
    from jax.experimental import pallas as pl

    B = qpos.shape[0]
    nq = model.nq
    n_planes = 3 * len(model.geom_body)
    if B % tile != 0:
        raise ValueError(f"batch {B} not divisible by tile {tile}")

    def kernel(qpos_ref, table_ref, out_ref):
        qp = tuple(qpos_ref[k, :] for k in range(nq))
        planes = _heightgrid_planes(grid, table_ref[:, :], model, qp)
        k = 0
        for c, gx, gy in planes:
            out_ref[k, :] = c
            out_ref[k + 1, :] = gx
            out_ref[k + 2, :] = gy
            k += 3

    call = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((nq, tile), lambda i: (0, i)),
            pl.BlockSpec(table.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_planes, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n_planes, B), jnp.float32),
        interpret=interpret,
    )
    return call(qpos.T.astype(jnp.float32), table.astype(jnp.float32)).T


def pallas_control_step(
    model: Model,
    qpos: jax.Array,  # [B, nq]
    qvel: jax.Array,  # [B, nv]
    target: jax.Array,  # [B, nj]
    kp: float,
    dt: float,
    n_substeps: int,
    tile: int = 256,
    interpret: bool = False,
    exact: bool = False,
    terrain=None,
    extra: "jax.Array | None" = None,  # [B, n_extra] DR+push+planes
    dr_fields: tuple = (),
    has_push: bool = False,
    n_terrain_planes: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One Pallas launch per CONTROL step: CRBA + Cholesky factor of
    ``M + dt·D`` computed IN-KERNEL (``crba_chol_soa``), then all
    ``n_substeps`` substeps, every intermediate VMEM-resident.

    This removes the once-per-control-step XLA factor build — generic
    CRBA plus 18 full-matrix rank-1 Cholesky updates, each an HBM
    round-trip over ``[B, nv, nv]`` — which a device profile showed
    dominating the fused train step once the substeps themselves moved
    into the megakernel (docs/performance.md). Per control step the
    kernel reads ``qpos/qvel/target`` once and writes the integrated
    state and last-substep normals once.

    Same held-factor semantics as the ``chol=``-passing path
    (``reuse_mass_matrix``): the factor comes from the pre-substep
    ``qpos`` and is held across the control step. With ``exact=True``
    the factor is instead recomputed from the CURRENT ``qpos`` at every
    substep — the exact-dynamics semantics of the generic engine's
    no-``chol`` path, still in one launch (the factor build is cheap
    once it is VMEM-resident lane math; on the XLA path exact dynamics
    cost ~45x the held-factor path purely in HBM round-trips).

    Production-realism features ride the same launch: ``terrain`` (an
    analytic heightfield — trace-time constants, a few fused sin/cos
    per contact), and ``extra`` — per-env domain-randomization scalars
    (``dr_fields`` names them), then the 3 push-force lanes
    (``has_push``), then ``n_terrain_planes`` frozen tangent-plane
    triples ``(c, gx, gy)`` per ground geom (HeightGrid terrain,
    produced once per control step by :func:`pallas_plane_sampler` —
    folding the table dots into THIS kernel OOM-killed the remote
    Mosaic compile helper), packed ``[B, n_extra]``. They add input
    lanes, not launches.
    """
    from jax.experimental import pallas as pl

    B = qpos.shape[0]
    nq, nv, nj = model.nq, model.nv, model.nj
    n_geoms = len(model.geom_body) + len(model.pair_geom_a)
    if B % tile != 0:
        raise ValueError(f"batch {B} not divisible by tile {tile}")
    n_extra = len(dr_fields) + (3 if has_push else 0) + 3 * n_terrain_planes
    if (extra is None) != (n_extra == 0):
        raise ValueError("extra must match dr_fields/has_push/planes")

    def kernel(*refs):
        if n_extra:
            (qpos_ref, qvel_ref, target_ref, extra_ref,
             qpos_out, qvel_out, normals_out) = refs
            sub_kw, crba_kw = _split_extra(
                [extra_ref[k, :] for k in range(n_extra)],
                dr_fields, has_push, n_terrain_planes,
            )
        else:
            (qpos_ref, qvel_ref, target_ref,
             qpos_out, qvel_out, normals_out) = refs
            sub_kw, crba_kw = {}, {}
        qp = tuple(qpos_ref[k, :] for k in range(nq))
        qv = tuple(qvel_ref[k, :] for k in range(nv))
        tgt = tuple(target_ref[k, :] for k in range(nj))
        chol_lanes = (
            None if exact else crba_chol_soa(model, qp, dt, **crba_kw)
        )
        normals = None
        for _ in range(n_substeps):
            if exact:
                chol_lanes = crba_chol_soa(model, qp, dt, **crba_kw)
            qp, qv, normals = substep_soa(model, qp, qv, tgt, chol_lanes,
                                          kp, dt, terrain=terrain, **sub_kw)
        for k in range(nq):
            qpos_out[k, :] = qp[k]
        for k in range(nv):
            qvel_out[k, :] = qv[k]
        for k in range(n_geoms):
            normals_out[k, :] = normals[k]

    def spec(k):
        return pl.BlockSpec((k, tile), lambda i: (0, i))

    in_specs = [spec(nq), spec(nv), spec(nj)]
    inputs = [
        qpos.T.astype(jnp.float32),
        qvel.T.astype(jnp.float32),
        target.T.astype(jnp.float32),
    ]
    if n_extra:
        in_specs.append(spec(n_extra))
        inputs.append(extra.T.astype(jnp.float32))

    call = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=in_specs,
        out_specs=[spec(nq), spec(nv), spec(n_geoms)],
        out_shape=[
            jax.ShapeDtypeStruct((nq, B), jnp.float32),
            jax.ShapeDtypeStruct((nv, B), jnp.float32),
            jax.ShapeDtypeStruct((n_geoms, B), jnp.float32),
        ],
        interpret=interpret,
    )

    qp_t, qv_t, normals_t = call(*inputs)
    return qp_t.T, qv_t.T, normals_t.T


def _pick_tile(B: int, model: "Model | None" = None) -> "int | None":
    """Largest lane tile that divides the batch and fits VMEM.

    Each SoA lane instruction processes ``tile`` f32 elements; a v5e
    vreg holds 1024, so tile=256 leaves 3/4 of every VPU instruction
    empty. Prefer the largest tile whose resident lane set fits in a
    conservative VMEM budget: inputs/outputs (nq+nv+nj+packed-chol+
    normals lanes) plus ~3x headroom for the substep's live
    intermediates (kinematics E/P per body, spatial vectors), which is
    what Mosaic keeps resident between def and last use.
    """
    budget = 64 * 2**20  # half of v5e's 128 MiB VMEM
    # 2048 capped: the VMEM estimate below is a heuristic and Mosaic
    # failures are only observable on real hardware — 2048 already puts
    # 2 full vregs behind every lane instruction (vs 1/4 at 256).
    for tile in (2048, 1024, 512, 256, 128):
        if B % tile != 0:
            continue
        if model is not None:
            nv = model.nv
            io_lanes = (
                model.nq + nv + model.nj
                + nv * (nv + 1) // 2
                + len(model.geom_body) + len(model.pair_geom_a)
            )
            # ~15 lanes per body for E(9)+P(3)+v(6)/f(6) live sets,
            # tripled for elementwise temporaries.
            live = io_lanes + 15 * model.n_bodies * 3
            if live * tile * 4 > budget:
                continue
        return tile
    return None


def make_control_step_runner(
    model: Model,
    kp: float,
    dt: float,
    n_substeps: int,
    force_pallas: bool = False,
    exact: bool = False,
    *,
    terrain=None,
    dr_fields: tuple = (),
    has_push: bool = False,
):
    """Like :func:`make_substep_runner` but with the mass-matrix factor
    computed IN-KERNEL: ``run(qpos, qvel, target[, extra])`` — no
    ``chol`` argument, no XLA-side CRBA/factor at all. Batched execution
    is one :func:`pallas_control_step` launch per control step.
    ``exact`` recomputes the factor every substep (exact dynamics
    instead of the ``reuse_mass_matrix`` held-factor approximation).

    Feature plumbing: ``terrain`` is a static analytic heightfield —
    OR a :class:`~nnx_ppo_tpu.physics.terrain.HeightGrid`, in which
    case the height table rides the kernel as a VMEM operand and each
    geom's frozen tangent plane is sampled IN-KERNEL at control-step
    start (one-hot MXU dots — no gathers, no XLA-side FK);
    ``dr_fields`` names the per-env domain-randomization scalars and
    ``has_push`` appends a 3-vector world push force — together they
    form the runner's packed per-env ``extra`` argument
    (``[len(dr_fields) + 3·has_push]``). When all are off the runner
    keeps the 3-argument signature."""
    from jax.custom_batching import custom_vmap

    import numpy as np

    from nnx_ppo_tpu.physics.terrain import HeightGrid

    nq, nv, nj = model.nq, model.nv, model.nj
    n_geoms = len(model.geom_body) + len(model.pair_geom_a)
    heightgrid = None
    if isinstance(terrain, HeightGrid):
        heightgrid = terrain
        terrain = None  # the grid never enters the substep; planes do
        table_const = jnp.asarray(
            np.asarray(heightgrid.data), jnp.float32
        )
    n_extra = len(dr_fields) + (3 if has_push else 0)
    # Operand layout: (qpos, qvel, target[, extra][, table]). The table
    # must be an explicit operand (not a closure constant):
    # custom_partitioning rejects traced closure consts, and as an
    # operand it gets an explicitly REPLICATED sharding below.
    has_table = heightgrid is not None
    n_state = 3 + (1 if n_extra else 0)
    n_in = n_state + (1 if has_table else 0)

    def run_one(*args):
        qpos, qvel, target = args[0], args[1], args[2]
        extra = args[3] if n_extra else None
        table = args[n_state] if has_table else None
        qp = tuple(qpos[k] for k in range(nq))
        qv = tuple(qvel[k] for k in range(nv))
        tgt = tuple(target[k] for k in range(nj))
        if n_extra:
            sub_kw, crba_kw = _split_extra(
                [extra[k] for k in range(n_extra)], dr_fields, has_push
            )
        else:
            sub_kw, crba_kw = {}, {}
        if has_table:
            sub_kw["terrain_planes"] = _heightgrid_planes(
                heightgrid, table, model, qp
            )
        chol_lanes = (
            None if exact else crba_chol_soa(model, qp, dt, **crba_kw)
        )
        normals = None
        for _ in range(n_substeps):
            if exact:
                chol_lanes = crba_chol_soa(model, qp, dt, **crba_kw)
            qp, qv, normals = substep_soa(model, qp, qv, tgt, chol_lanes,
                                          kp, dt, terrain=terrain, **sub_kw)
        return (
            jnp.stack(qp),
            jnp.stack(qv),
            jnp.stack(normals) if n_geoms else jnp.zeros((0,)),
        )

    def run_batch(*args):
        """Batched dispatch on whatever batch it is handed — the GLOBAL
        env axis on one device, or a PER-SHARD slice when GSPMD
        partitions the wrapped call below (tile choice is local). The
        trailing table operand (heightgrid mode) is UNbatched."""
        B = args[0].shape[0]
        on_tpu = jax.default_backend() == "tpu"
        tile = _pick_tile(B, model) if on_tpu else B
        if force_pallas or (on_tpu and tile is not None):
            extra = args[3] if n_extra else None
            n_planes = 0
            if has_table:
                # HeightGrid: the dedicated sampler kernel produces the
                # per-geom tangent-plane lanes once per control step;
                # they join the packed extra lanes of the physics
                # kernel (folding the table dots into the physics
                # kernel itself OOM-killed the Mosaic compile helper).
                n_planes = len(model.geom_body)
                sampler_tile = tile if tile is not None else B
                while sampler_tile > 512 and B % (sampler_tile // 2) == 0:
                    sampler_tile //= 2
                planes = pallas_plane_sampler(
                    model, heightgrid, args[0], args[n_state],
                    tile=sampler_tile, interpret=not on_tpu,
                )
                extra = (
                    planes
                    if extra is None
                    else jnp.concatenate([extra, planes], axis=1)
                )
            return pallas_control_step(
                model, *args[:3], kp, dt, n_substeps,
                tile=tile if tile is not None else B,
                interpret=not on_tpu,
                exact=exact,
                terrain=terrain,
                extra=extra,
                dr_fields=dr_fields,
                has_push=has_push,
                n_terrain_planes=n_planes,
            )
        in_axes = (0,) * n_state + ((None,) if has_table else ())
        return jax.vmap(run_one, in_axes=in_axes)(*args)

    # GSPMD partitioning rule for the megakernel. Without it the SPMD
    # partitioner treats the pallas_call as an opaque custom call:
    # measured on an 8-device mesh, it ALL-GATHERS every operand and
    # replicates the whole global batch on every device — zero scaling.
    # With it, each device runs the kernel on its local env shard (the
    # batch axis is dim 0 of every operand and result; all other dims
    # are replicated), which is exactly the data-parallel layout the
    # training stack shards envs with (parallel/mesh.py).
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    dispatch = custom_partitioning(run_batch)

    def _batch_axis(arg_infos):
        # Collect the dim-0 mesh axis of every BATCHED operand and
        # require agreement: operands arriving sharded on different
        # axes would mean an upstream layout bug, and silently
        # force-resharding the rest onto the first one would mask it.
        # (The trailing table operand is replicated and skipped.)
        axes = set()
        for info in list(arg_infos)[:n_state]:
            s = getattr(info, "sharding", None)
            spec = getattr(s, "spec", None)
            if spec is not None and len(spec) and spec[0] is not None:
                axes.add(spec[0])
        if len(axes) > 1:
            raise ValueError(
                "physics megakernel operands are sharded on different "
                f"mesh axes along the env (dim-0) axis: {sorted(map(str, axes))}; "
                "all batched operands must share one data axis"
            )
        return axes.pop() if axes else None

    def _infer(mesh, arg_infos, result_infos):
        ax = _batch_axis(arg_infos)
        return tuple(
            NamedSharding(mesh, PartitionSpec(ax, None)) for _ in range(3)
        )

    def _partition(mesh, arg_infos, result_infos):
        ax = _batch_axis(arg_infos)
        arg_sh = tuple(
            NamedSharding(mesh, PartitionSpec(ax, None))
            for _ in range(n_state)
        ) + (
            (NamedSharding(mesh, PartitionSpec(None, None)),)
            if has_table
            else ()
        )
        res_sh = tuple(
            NamedSharding(mesh, PartitionSpec(ax, None)) for _ in range(3)
        )
        return mesh, run_batch, res_sh, arg_sh

    dispatch.def_partition(
        infer_sharding_from_operands=_infer,
        partition=_partition,
        # Shardy rule: batch factor shared by every batched operand /
        # result dim 0; feature dims (and the whole replicated table)
        # are distinct factors.
        sharding_rule=(
            ", ".join(f"b i{k}" for k in range(n_state))
            + (", t0 t1" if has_table else "")
            + " -> "
            + ", ".join(f"b o{k}" for k in range(3))
        ),
    )

    def batch_args(axis_size, in_batched, args):
        def ensure(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        # State operands broadcast to the batch; the table stays
        # unbatched (replicated operand of the dispatch).
        state = tuple(
            ensure(x, b)
            for x, b in zip(args[:n_state], in_batched[:n_state])
        )
        return state + tuple(args[n_state:])

    if n_extra == 0:

        @custom_vmap
        def run_inner(qpos, qvel, target, *table):
            return run_one(qpos, qvel, target, *table)

        @run_inner.def_vmap
        def run_vmap(axis_size, in_batched, qpos, qvel, target, *table):
            args = batch_args(
                axis_size, in_batched, (qpos, qvel, target) + table
            )
            return dispatch(*args), (True, True, True)

        def run(qpos, qvel, target):
            if has_table:
                return run_inner(qpos, qvel, target, table_const)
            return run_inner(qpos, qvel, target)

    else:

        @custom_vmap
        def run_inner(qpos, qvel, target, extra, *table):
            return run_one(qpos, qvel, target, extra, *table)

        @run_inner.def_vmap
        def run_vmap(axis_size, in_batched, qpos, qvel, target, extra,
                     *table):
            args = batch_args(
                axis_size, in_batched, (qpos, qvel, target, extra) + table
            )
            return dispatch(*args), (True, True, True)

        def run(qpos, qvel, target, extra):
            if has_table:
                return run_inner(qpos, qvel, target, extra, table_const)
            return run_inner(qpos, qvel, target, extra)

    return run


def make_substep_runner(
    model: Model,
    kp: float,
    dt: float,
    n_substeps: int,
    force_pallas: bool = False,
    substeps_per_kernel: int = 1,
):
    """Per-env substep function whose BATCHED execution is the Pallas
    megakernel.

    Returns ``run(qpos [nq], qvel [nv], target [nj], chol [nv, nv]) ->
    (qpos', qvel', last_normals [n_geoms])``. Called unbatched (e.g.
    the single-env render rollout) it traces the SoA math on scalar
    lanes; under ``jax.vmap`` a ``custom_vmap`` rule receives the whole
    env batch and dispatches it to :func:`pallas_substeps` — on TPU
    with a lane-aligned batch, or anywhere in interpret mode when
    ``force_pallas`` is set (exactness tests). Otherwise the rule falls
    back to vmapping the scalar-lane path, which XLA fuses the usual
    way.
    """
    from jax.custom_batching import custom_vmap

    nq, nv, nj = model.nq, model.nv, model.nj
    n_geoms = len(model.geom_body) + len(model.pair_geom_a)
    if substeps_per_kernel in (0, -1):
        substeps_per_kernel = n_substeps
    if n_substeps % substeps_per_kernel != 0:
        raise ValueError(
            f"n_substeps ({n_substeps}) must be a multiple of "
            f"substeps_per_kernel ({substeps_per_kernel})"
        )

    def run_one(qpos, qvel, target, chol):
        qp = tuple(qpos[k] for k in range(nq))
        qv = tuple(qvel[k] for k in range(nv))
        tgt = tuple(target[k] for k in range(nj))
        chol_lanes = tuple(
            tuple(chol[i, j] for j in range(i + 1)) for i in range(nv)
        )
        normals = None
        for _ in range(n_substeps):
            qp, qv, normals = substep_soa(model, qp, qv, tgt, chol_lanes,
                                          kp, dt)
        return (
            jnp.stack(qp),
            jnp.stack(qv),
            jnp.stack(normals) if n_geoms else jnp.zeros((0,)),
        )

    @custom_vmap
    def run(qpos, qvel, target, chol):
        return run_one(qpos, qvel, target, chol)

    @run.def_vmap
    def run_vmap(axis_size, in_batched, qpos, qvel, target, chol):
        def ensure(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        qpos = ensure(qpos, in_batched[0])
        qvel = ensure(qvel, in_batched[1])
        target = ensure(target, in_batched[2])
        chol = ensure(chol, in_batched[3])

        on_tpu = jax.default_backend() == "tpu"
        tile = _pick_tile(axis_size, model) if on_tpu else axis_size
        if force_pallas or (on_tpu and tile is not None):
            out = pallas_substeps(
                model, qpos, qvel, target, chol, kp, dt, n_substeps,
                tile=tile if tile is not None else axis_size,
                interpret=not on_tpu,
                substeps_per_kernel=substeps_per_kernel,
            )
        else:
            out = jax.vmap(run_one)(qpos, qvel, target, chol)
        return out, (True, True, True)

    return run


# ------------------------------------------------------------ scene kernel


def pallas_scene_step(
    models,
    pairs,
    qpos_cat: jax.Array,  # [B, sum nq]
    qvel_cat: jax.Array,  # [B, sum nv]
    tau_cat: jax.Array,  # [B, sum nv]
    dt: float,
    n_substeps: int,
    tile: int = 256,
    interpret: bool = False,
    terrain=None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One Pallas launch per CONTROL step of a multi-tree SCENE
    (``engine_soa_general.scene_substep_soa``): every tree's exact
    per-substep dynamics (in-kernel CRBA + Cholesky — the manipulation
    trees are tiny, nv ≤ 6) plus cross-tree sphere contacts, all
    VMEM-resident across the substeps.

    The manipulation envs' XLA path (``scene.scene_step``) measured
    0.86M env-steps/s on ``pusher_4096`` with ~4,400 kernel launches
    per train iteration — the dispatch-bound pathology this kernel
    removes (same design as :func:`pallas_control_step` for legged
    locomotion).

    Inputs are the per-tree states concatenated on the feature axis;
    normals output = per-tree (ground geoms, then intra-tree pairs) in
    tree order, then the cross-tree pair normals.
    """
    from jax.experimental import pallas as pl

    from nnx_ppo_tpu.physics.engine_soa_general import scene_substep_soa

    B = qpos_cat.shape[0]
    nqs = [m.nq for m in models]
    nvs = [m.nv for m in models]
    n_normals = sum(
        len(m.geom_body) + len(m.pair_geom_a) for m in models
    ) + len(pairs)
    NQ, NV = sum(nqs), sum(nvs)
    if B % tile != 0:
        raise ValueError(f"batch {B} not divisible by tile {tile}")

    def kernel(qpos_ref, qvel_ref, tau_ref, qpos_out, qvel_out, normals_out):
        qposs, qvels, taus = [], [], []
        qc = vc = 0
        for m in models:
            qposs.append(tuple(qpos_ref[qc + k, :] for k in range(m.nq)))
            qvels.append(tuple(qvel_ref[vc + k, :] for k in range(m.nv)))
            taus.append(tuple(tau_ref[vc + k, :] for k in range(m.nv)))
            qc += m.nq
            vc += m.nv
        qposs, qvels, taus = tuple(qposs), tuple(qvels), tuple(taus)
        tree_normals = cross = None
        for _ in range(n_substeps):
            qposs, qvels, tree_normals, cross = scene_substep_soa(
                models, pairs, qposs, qvels, taus, dt, terrain=terrain
            )
        qc = vc = 0
        for t, m in enumerate(models):
            for k in range(m.nq):
                qpos_out[qc + k, :] = qposs[t][k]
            for k in range(m.nv):
                qvel_out[vc + k, :] = qvels[t][k]
            qc += m.nq
            vc += m.nv
        nc = 0
        for t in range(len(models)):
            for fn in tree_normals[t]:
                normals_out[nc, :] = fn
                nc += 1
        for fn in cross:
            normals_out[nc, :] = fn
            nc += 1

    def spec(k):
        return pl.BlockSpec((k, tile), lambda i: (0, i))

    call = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[spec(NQ), spec(NV), spec(NV)],
        out_specs=[spec(NQ), spec(NV), spec(max(n_normals, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((NQ, B), jnp.float32),
            jax.ShapeDtypeStruct((NV, B), jnp.float32),
            jax.ShapeDtypeStruct((max(n_normals, 1), B), jnp.float32),
        ],
        interpret=interpret,
    )
    qp_t, qv_t, normals_t = call(
        qpos_cat.T.astype(jnp.float32),
        qvel_cat.T.astype(jnp.float32),
        tau_cat.T.astype(jnp.float32),
    )
    return qp_t.T, qv_t.T, normals_t.T


def make_scene_control_step_runner(
    models,
    pairs,
    dt: float,
    n_substeps: int,
    force_pallas: bool = False,
    terrain=None,
):
    """Scene analogue of :func:`make_control_step_runner`:
    ``run(qpos_cat, qvel_cat, tau_cat) -> (qpos_cat', qvel_cat',
    normals)`` advancing a whole control step of a multi-tree scene
    (or a single general tree — ``models`` of length 1, no pairs) in
    ONE Pallas launch per tile on TPU, with the same custom_vmap
    dispatch, GSPMD partition rule, and XLA fallback as the locomotion
    runner. Exact per-substep dynamics (``scene.scene_step``
    semantics). ``qpos_cat``/``qvel_cat``/``tau_cat`` are the per-tree
    vectors concatenated."""
    from jax.custom_batching import custom_vmap
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    from nnx_ppo_tpu.physics.engine_soa_general import (
        scene_substep_soa,
        soa_general_unsupported_reason,
    )

    for m in models:
        reason = soa_general_unsupported_reason(m)
        if reason is not None:
            raise ValueError(f"scene kernel unsupported: {reason}")
    nqs = [m.nq for m in models]
    nvs = [m.nv for m in models]
    NQ, NV = sum(nqs), sum(nvs)
    n_normals = sum(
        len(m.geom_body) + len(m.pair_geom_a) for m in models
    ) + len(pairs)

    def run_one(qpos_cat, qvel_cat, tau_cat):
        qposs, qvels, taus = [], [], []
        qc = vc = 0
        for m in models:
            qposs.append(tuple(qpos_cat[qc + k] for k in range(m.nq)))
            qvels.append(tuple(qvel_cat[vc + k] for k in range(m.nv)))
            taus.append(tuple(tau_cat[vc + k] for k in range(m.nv)))
            qc += m.nq
            vc += m.nv
        qposs, qvels, taus = tuple(qposs), tuple(qvels), tuple(taus)
        tree_normals = cross = None
        for _ in range(n_substeps):
            qposs, qvels, tree_normals, cross = scene_substep_soa(
                models, pairs, qposs, qvels, taus, dt, terrain=terrain
            )
        flat_normals = [fn for t in range(len(models))
                        for fn in tree_normals[t]] + list(cross)
        return (
            jnp.stack([q for tq in qposs for q in tq]),
            jnp.stack([q for tq in qvels for q in tq]),
            jnp.stack(flat_normals) if flat_normals else jnp.zeros((0,)),
        )

    def run_batch(*args):
        B = args[0].shape[0]
        on_tpu = jax.default_backend() == "tpu"
        # Manipulation trees are tiny (a few bodies); VMEM pressure is
        # far below the locomotion kernel's, so tile choice only needs
        # divisibility.
        tile = None
        if on_tpu or force_pallas:
            for t in (2048, 1024, 512, 256, 128):
                if B % t == 0:
                    tile = t
                    break
        if force_pallas or (on_tpu and tile is not None):
            return pallas_scene_step(
                models, pairs, *args, dt, n_substeps,
                tile=tile if tile is not None else B,
                interpret=not on_tpu,
                terrain=terrain,
            )
        return jax.vmap(run_one)(*args)

    dispatch = custom_partitioning(run_batch)

    def _batch_axis(arg_infos):
        axes = set()
        for info in arg_infos:
            s = getattr(info, "sharding", None)
            spec = getattr(s, "spec", None)
            if spec is not None and len(spec) and spec[0] is not None:
                axes.add(spec[0])
        if len(axes) > 1:
            raise ValueError(
                "scene megakernel operands are sharded on different mesh "
                f"axes along the env (dim-0) axis: {sorted(map(str, axes))}"
            )
        return axes.pop() if axes else None

    def _infer(mesh, arg_infos, result_infos):
        ax = _batch_axis(arg_infos)
        return tuple(
            NamedSharding(mesh, PartitionSpec(ax, None)) for _ in range(3)
        )

    def _partition(mesh, arg_infos, result_infos):
        ax = _batch_axis(arg_infos)
        arg_sh = tuple(
            NamedSharding(mesh, PartitionSpec(ax, None)) for _ in range(3)
        )
        res_sh = tuple(
            NamedSharding(mesh, PartitionSpec(ax, None)) for _ in range(3)
        )
        return mesh, run_batch, res_sh, arg_sh

    dispatch.def_partition(
        infer_sharding_from_operands=_infer,
        partition=_partition,
        sharding_rule="b i0, b i1, b i2 -> b o0, b o1, b o2",
    )

    @custom_vmap
    def run(qpos_cat, qvel_cat, tau_cat):
        return run_one(qpos_cat, qvel_cat, tau_cat)

    @run.def_vmap
    def run_vmap(axis_size, in_batched, qpos_cat, qvel_cat, tau_cat):
        def ensure(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        args = tuple(
            ensure(x, b)
            for x, b in zip((qpos_cat, qvel_cat, tau_cat), in_batched)
        )
        return dispatch(*args), (True, True, True)

    return run
