"""Procedural heightfield terrain for the penalty-contact engine.

The reference's physics substrate offers flat *and* uneven ground
(mujoco_playground ships rough-terrain variants of its locomotion
tasks); this module is the TPU-native counterpart for the in-repo
engine. A :class:`Terrain` is a smooth analytic heightfield

    h(x, y) = gₓ·x + g_y·y + Σₖ aₖ · sin(ωₖ · (dₖ·(x,y)) + φₖ)

— a global slope plus a superposition of directional waves. Analytic
and branch-free, so ground contacts stay a handful of fused VPU ops
per geom under ``vmap``: no heightmap textures, no gathers, no
dynamic shapes. The surface normal comes from the exact gradient.

Per-env terrain variation needs no per-env parameters: the field is
spatially aperiodic (incommensurate wave directions), so envs that
spawn at random world positions each see their own local terrain —
the randomization lives in ``reset``, the trace stays identical for
every env.

Validity regime: penetration depth and contact point use the
first-order surface approximation at the sphere center (exact for
planes) — accurate while the terrain's curvature radius is large
against the contact sphere radius, i.e. wavelengths ≳ 10× the foot
radius. :func:`rough_terrain` respects that by construction.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Terrain:
    """Static (trace-time) description of an analytic heightfield.

    All fields are plain Python tuples, so a ``Terrain`` is hashable
    and can ride along an env instance exactly like a
    :class:`~nnx_ppo_tpu.physics.model.Model` does — it is never a
    traced value.
    """

    amplitudes: tuple[float, ...] = ()
    frequencies: tuple[float, ...] = ()  # spatial angular freq [rad/m]
    directions: tuple[tuple[float, float], ...] = ()  # unit wave dirs
    phases: tuple[float, ...] = ()
    slope: tuple[float, float] = (0.0, 0.0)  # (∂h/∂x, ∂h/∂y) global

    def __post_init__(self):
        n = len(self.amplitudes)
        if not (len(self.frequencies) == len(self.directions)
                == len(self.phases) == n):
            raise ValueError("wave parameter tuples must share a length")

    # -- geometry ---------------------------------------------------------

    def height(self, xy: jax.Array) -> jax.Array:
        """Terrain height at world ``xy`` ([2] → scalar)."""
        h = self.slope[0] * xy[0] + self.slope[1] * xy[1]
        for a, f, d, p in zip(self.amplitudes, self.frequencies,
                              self.directions, self.phases):
            h = h + a * jnp.sin(f * (d[0] * xy[0] + d[1] * xy[1]) + p)
        return h

    def grad(self, xy: jax.Array) -> jax.Array:
        """Exact analytic ``(∂h/∂x, ∂h/∂y)`` at ``xy``."""
        gx = jnp.asarray(self.slope[0], jnp.float32)
        gy = jnp.asarray(self.slope[1], jnp.float32)
        for a, f, d, p in zip(self.amplitudes, self.frequencies,
                              self.directions, self.phases):
            c = a * f * jnp.cos(f * (d[0] * xy[0] + d[1] * xy[1]) + p)
            gx = gx + d[0] * c
            gy = gy + d[1] * c
        return jnp.stack([gx, gy])

    def normal(self, xy: jax.Array) -> jax.Array:
        """Upward unit surface normal at ``xy`` ([3])."""
        g = self.grad(xy)
        n = jnp.concatenate([-g, jnp.ones(1)])
        return n / jnp.sqrt(jnp.sum(n**2))


@dataclasses.dataclass(frozen=True, eq=False)
class HeightGrid:
    """Grid-based heightfield: bilinear interpolation over a sampled
    height map — the counterpart to the analytic :class:`Terrain` for
    ground that comes as DATA (MuJoCo ``hfield`` assets, scanned
    elevation maps) rather than a formula.

    Implements the same ``height(xy)`` / ``grad(xy)`` / ``normal(xy)``
    surface the contact engine consumes; under ``vmap`` each lookup is
    four clamped gathers plus fused arithmetic. The gradient is the
    exact derivative of the bilinear interpolant (piecewise linear per
    cell — consistent with ``height``, which is what the first-order
    contact model needs). Outside the grid the edge values extend
    flat. The array is trace-time constant data: one compiled program,
    no per-env copies.

    ``data[i, j]`` is the height at ``(x0 + i·dx, y0 + j·dy)``.
    """

    data: np.ndarray  # [nx, ny]
    x0: float
    y0: float
    dx: float
    dy: float

    def __post_init__(self):
        if np.asarray(self.data).ndim != 2:
            raise ValueError("HeightGrid data must be [nx, ny]")
        if min(np.asarray(self.data).shape) < 2:
            raise ValueError("HeightGrid needs at least a 2x2 grid")

    def _cell(self, xy: jax.Array):
        # ND-vectorized: ``xy`` is [..., 2]; every return is [...]. A
        # stacked call (all of an env's contact geoms at once) is the
        # fast form — ONE 4-way gather instead of 4 per geom.
        d = jnp.asarray(self.data, jnp.float32)
        nx, ny = d.shape
        u = (xy[..., 0] - self.x0) / self.dx
        v = (xy[..., 1] - self.y0) / self.dy
        i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, nx - 2)
        j = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, ny - 2)
        fx = jnp.clip(u - i, 0.0, 1.0)
        fy = jnp.clip(v - j, 0.0, 1.0)
        h00 = d[i, j]
        h10 = d[i + 1, j]
        h01 = d[i, j + 1]
        h11 = d[i + 1, j + 1]
        return h00, h10, h01, h11, fx, fy

    def height(self, xy: jax.Array) -> jax.Array:
        """Bilinear height at world ``xy`` ([..., 2] → [...])."""
        if self._use_dot():
            c, gx, gy = self._plane_via_dot(xy)
            return c + gx * xy[..., 0] + gy * xy[..., 1]
        h00, h10, h01, h11, fx, fy = self._cell(xy)
        return (
            h00 * (1 - fx) * (1 - fy)
            + h10 * fx * (1 - fy)
            + h01 * (1 - fx) * fy
            + h11 * fx * fy
        )

    def _use_dot(self) -> bool:
        # TPU: native gathers from the table measured ~21 µs per
        # [2048]-batched lookup (XLA lowers them to slow custom
        # fusions); the one-hot-weighted MXU dot form is ~2-4x faster
        # and is the same math the megakernel sampler uses
        # (engine_soa.heightgrid_planes_soa).
        return jax.default_backend() == "tpu"

    def _plane_via_dot(self, xy: jax.Array) -> tuple:
        """Tangent plane via one-hot-weighted MXU dots (no gather)."""
        d = jnp.asarray(self.data, jnp.float32)
        nx, ny = d.shape
        u = (xy[..., 0] - self.x0) / self.dx
        v = (xy[..., 1] - self.y0) / self.dy
        i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, nx - 2)
        j = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, ny - 2)
        fx = jnp.clip(u - i, 0.0, 1.0)
        fy = jnp.clip(v - j, 0.0, 1.0)
        flat_i = i.reshape(-1)
        flat_j = j.reshape(-1)
        iota_x = jnp.arange(nx, dtype=jnp.int32)
        iota_y = jnp.arange(ny, dtype=jnp.int32)
        ohi = (flat_i[:, None] == iota_x).astype(jnp.float32)
        ohi1 = (flat_i[:, None] + 1 == iota_x).astype(jnp.float32)
        wi = (1.0 - fx.reshape(-1))[:, None] * ohi + fx.reshape(-1)[:, None] * ohi1
        wdi = (ohi1 - ohi) / self.dx
        rows = jnp.dot(wi, d, preferred_element_type=jnp.float32)
        rows_dx = jnp.dot(wdi, d, preferred_element_type=jnp.float32)
        ohj = (flat_j[:, None] == iota_y).astype(jnp.float32)
        ohj1 = (flat_j[:, None] + 1 == iota_y).astype(jnp.float32)
        wj = (1.0 - fy.reshape(-1))[:, None] * ohj + fy.reshape(-1)[:, None] * ohj1
        wdj = (ohj1 - ohj) / self.dy
        h = jnp.sum(rows * wj, axis=-1).reshape(u.shape)
        gx = jnp.sum(rows_dx * wj, axis=-1).reshape(u.shape)
        gy = jnp.sum(rows * wdj, axis=-1).reshape(u.shape)
        in_x = ((u >= 0.0) & (u <= nx - 1)).astype(jnp.float32)
        in_y = ((v >= 0.0) & (v <= ny - 1)).astype(jnp.float32)
        gx = gx * in_x
        gy = gy * in_y
        c = h - gx * xy[..., 0] - gy * xy[..., 1]
        return c, gx, gy

    def _grad_parts(self, xy, h00, h10, h01, h11, fx, fy):
        d = np.asarray(self.data).shape
        u = (xy[..., 0] - self.x0) / self.dx
        v = (xy[..., 1] - self.y0) / self.dy
        in_x = ((u >= 0.0) & (u <= d[0] - 1)).astype(jnp.float32)
        in_y = ((v >= 0.0) & (v <= d[1] - 1)).astype(jnp.float32)
        gx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) / self.dx
        gy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) / self.dy
        return gx * in_x, gy * in_y

    def grad(self, xy: jax.Array) -> jax.Array:
        """Exact gradient of the bilinear interpolant at ``xy`` — zero
        on the flat extension beyond the grid, matching ``height``'s
        clamping (otherwise contacts out there would feel the edge
        cell's slope as a phantom lateral push). [..., 2] → [..., 2]
        (stacked on the last axis)."""
        if self._use_dot():
            _, gx, gy = self._plane_via_dot(xy)
        else:
            cell = self._cell(xy)
            gx, gy = self._grad_parts(xy, *cell)
        return jnp.stack([gx, gy], axis=-1) if xy.ndim > 1 else jnp.stack([gx, gy])

    def plane(self, xy: jax.Array) -> tuple:
        """Local tangent plane ``h(x, y) = c + gx·x + gy·y`` of the
        interpolant at ``xy`` ([..., 2] → three [...] arrays) from ONE
        cell evaluation — the fused form of ``height`` + ``grad`` used
        to build the megakernel's per-contact terrain lanes."""
        if self._use_dot():
            return self._plane_via_dot(xy)
        cell = self._cell(xy)
        h00, h10, h01, h11, fx, fy = cell
        h = (
            h00 * (1 - fx) * (1 - fy)
            + h10 * fx * (1 - fy)
            + h01 * (1 - fx) * fy
            + h11 * fx * fy
        )
        gx, gy = self._grad_parts(xy, *cell)
        c = h - gx * xy[..., 0] - gy * xy[..., 1]
        return c, gx, gy

    def normal(self, xy: jax.Array) -> jax.Array:
        """Upward unit surface normal at ``xy`` ([2] → [3])."""
        g = self.grad(xy)
        n = jnp.concatenate([-g, jnp.ones(1)])
        return n / jnp.sqrt(jnp.sum(n**2))

    @staticmethod
    def sample(terrain, extent: float, n: int = 256) -> "HeightGrid":
        """Sample any ``height(xy)``-surface (e.g. an analytic
        :class:`Terrain`) onto an ``n × n`` grid spanning
        ``[-extent, extent]²`` — mostly for tests and for exporting
        analytic terrain as data."""
        xs = np.linspace(-extent, extent, n)
        grid = np.asarray(
            jax.vmap(
                lambda x: jax.vmap(
                    lambda y: terrain.height(jnp.stack([x, y]))
                )(jnp.asarray(xs, jnp.float32))
            )(jnp.asarray(xs, jnp.float32))
        )
        step = float(xs[1] - xs[0])
        return HeightGrid(
            data=grid, x0=float(xs[0]), y0=float(xs[0]), dx=step, dy=step
        )


def flat() -> Terrain:
    """The trivial terrain h ≡ 0 (for exactness tests vs the plane
    ground path — the engine's ``terrain=None`` fast path)."""
    return Terrain()


def inclined(slope_x: float = 0.0, slope_y: float = 0.0) -> Terrain:
    """A perfect inclined plane (analytic-mechanics test surface)."""
    return Terrain(slope=(slope_x, slope_y))


def stairs(
    step_height: float = 0.08,
    step_length: float = 0.35,
    direction: tuple[float, float] = (1.0, 0.0),
) -> Terrain:
    """Smooth staircase climbing along ``direction``: the classic
    analytic stair ``h(s) = H·(s/L − sin(2πs/L)/(2π))`` — gradient
    ``(H/L)(1 − cos(2πs/L))`` is exactly zero once per period (flat
    treads at s = kL) and peaks at 2H/L mid-riser; each period rises
    exactly ``step_height``. Expressible in the slope+sine basis, so it
    needs no new engine code."""
    dn = math.hypot(direction[0], direction[1])
    dx, dy = direction[0] / dn, direction[1] / dn
    H, L = step_height, step_length
    return Terrain(
        amplitudes=(H / (2.0 * math.pi),),
        frequencies=(2.0 * math.pi / L,),
        directions=((dx, dy),),
        phases=(math.pi,),  # −sin
        slope=(H / L * dx, H / L * dy),
    )


def rough_terrain(
    seed: int = 0,
    amplitude: float = 0.04,
    wavelength: float = 1.2,
    n_waves: int = 6,
    slope: tuple[float, float] = (0.0, 0.0),
) -> Terrain:
    """Standard isotropic rough ground: ``n_waves`` random-direction
    waves with wavelengths in [wavelength, 2·wavelength] and total
    height std ≈ ``amplitude``. Directions/frequencies are drawn
    incommensurate, so the field never repeats — random spawn positions
    give every env distinct local terrain.
    """
    rng = np.random.RandomState(seed)
    angles = rng.uniform(0.0, 2.0 * math.pi, n_waves)
    lengths = rng.uniform(wavelength, 2.0 * wavelength, n_waves)
    # Σ (a·sin)² has variance n·a²/2 → scale for total std ≈ amplitude.
    a = amplitude * math.sqrt(2.0 / n_waves)
    return Terrain(
        amplitudes=tuple(float(a) for _ in range(n_waves)),
        frequencies=tuple(float(2.0 * math.pi / L) for L in lengths),
        directions=tuple(
            (float(math.cos(t)), float(math.sin(t))) for t in angles
        ),
        phases=tuple(float(p) for p in rng.uniform(0, 2 * math.pi, n_waves)),
        slope=slope,
    )
