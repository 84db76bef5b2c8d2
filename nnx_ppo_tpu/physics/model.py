"""Rigid-body model description (static) and builder.

A :class:`Model` is *static metadata* — plain Python/numpy constants
baked into the XLA trace — describing a kinematic tree of rigid bodies:
a free-floating or fixed base plus hinge joints, sphere contact geoms,
and a ground plane at z = 0. The dynamic state (``qpos``/``qvel``) lives
in env ``State.data`` pytrees; the engine (``physics/engine.py``) is a
pure function of (model, state).

Layout (MuJoCo-like):

* ``qpos``: ``[3 base pos (world), 4 base quat (w,x,y,z), nj hinge
  angles]`` for a free base, or just ``[nj]`` for a fixed base.
* ``qvel``: ``[3 base ω (body frame), 3 base v (body frame), nj hinge
  rates]`` for a free base — the base's 6 velocity dofs are the body's
  spatial velocity in its own frame (Featherstone-native; no transform
  on the hot path), or ``[nj]`` for a fixed base.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

FREE = "free"
HINGE = "hinge"


@dataclasses.dataclass(frozen=True)
class Model:
    """Static kinematic-tree description. All arrays are numpy constants."""

    parent: tuple[int, ...]  # parent body index; -1 = world
    joint_type: tuple[str, ...]  # FREE (body 0 only) or HINGE
    joint_axis: np.ndarray  # [NB, 3] hinge axis in child frame
    joint_pos: np.ndarray  # [NB, 3] child-frame origin in parent coords (q=0)
    mass: np.ndarray  # [NB]
    com: np.ndarray  # [NB, 3] center of mass in body frame
    inertia: np.ndarray  # [NB, 3, 3] rotational inertia about the COM
    geom_body: tuple[int, ...]  # contact sphere: owning body
    geom_offset: np.ndarray  # [NG, 3] sphere center in body frame
    geom_radius: np.ndarray  # [NG]
    damping: np.ndarray  # [nv] per-dof viscous joint damping
    armature: np.ndarray  # [nv] added diagonal (rotor) inertia
    gravity: float = -9.81

    # Contact model parameters (penalty/compliant; see engine.py).
    contact_stiffness: float = 5_000.0
    contact_damping: float = 100.0
    friction: float = 0.8

    @property
    def n_bodies(self) -> int:
        return len(self.parent)

    @property
    def nj(self) -> int:
        return sum(1 for t in self.joint_type if t == HINGE)

    @property
    def nv(self) -> int:
        return (6 if self.joint_type[0] == FREE else 0) + self.nj

    @property
    def nq(self) -> int:
        return (7 if self.joint_type[0] == FREE else 0) + self.nj

    @property
    def free_base(self) -> bool:
        return self.joint_type[0] == FREE

    def dof_slices(self) -> list[tuple[int, int]]:
        """Per-body (start, n_dofs) into qvel, in body order."""
        out = []
        cursor = 0
        for t in self.joint_type:
            n = 6 if t == FREE else 1
            out.append((cursor, n))
            cursor += n
        return out


class ModelBuilder:
    """Incremental model construction (bodies in topological order)."""

    def __init__(self, gravity: float = -9.81):
        self._gravity = gravity
        self._parent: list[int] = []
        self._joint_type: list[str] = []
        self._joint_axis: list[np.ndarray] = []
        self._joint_pos: list[np.ndarray] = []
        self._mass: list[float] = []
        self._com: list[np.ndarray] = []
        self._inertia: list[np.ndarray] = []
        self._geom_body: list[int] = []
        self._geom_offset: list[np.ndarray] = []
        self._geom_radius: list[float] = []
        self._damping: list[float] = []
        self._armature: list[float] = []
        self._names: dict[str, int] = {}

    def add_body(
        self,
        name: str,
        *,
        parent: Optional[str] = None,
        joint: str = HINGE,
        axis=(0.0, 1.0, 0.0),
        pos=(0.0, 0.0, 0.0),
        mass: float = 1.0,
        com=(0.0, 0.0, 0.0),
        inertia=(0.01, 0.01, 0.01),
        damping: float = 0.0,
        armature: float = 0.0,
    ) -> int:
        """Add a body jointed to ``parent`` (None = world; first body only).

        ``inertia`` is a diagonal ``[3]`` or full ``[3, 3]`` rotational
        inertia about the COM; ``pos`` is the child frame origin in
        parent coords at the zero configuration.
        """
        if parent is None:
            if self._parent:
                raise ValueError("only the first body may attach to the world")
            parent_idx = -1
        else:
            parent_idx = self._names[parent]
        if joint == FREE and self._parent:
            raise ValueError("free joint is only supported on the base body")
        idx = len(self._parent)
        self._names[name] = idx
        self._parent.append(parent_idx)
        self._joint_type.append(joint)
        self._joint_axis.append(np.asarray(axis, np.float64))
        self._joint_pos.append(np.asarray(pos, np.float64))
        self._mass.append(float(mass))
        self._com.append(np.asarray(com, np.float64))
        inertia = np.asarray(inertia, np.float64)
        self._inertia.append(np.diag(inertia) if inertia.ndim == 1 else inertia)
        n_dofs = 6 if joint == FREE else 1
        self._damping.extend([damping] * n_dofs)
        self._armature.extend([armature] * n_dofs)
        return idx

    def add_sphere_geom(self, body: str, offset, radius: float) -> None:
        self._geom_body.append(self._names[body])
        self._geom_offset.append(np.asarray(offset, np.float64))
        self._geom_radius.append(float(radius))

    def body_index(self, name: str) -> int:
        return self._names[name]

    def finalize(self, **contact_params) -> Model:
        return Model(
            parent=tuple(self._parent),
            joint_type=tuple(self._joint_type),
            joint_axis=np.stack(self._joint_axis),
            joint_pos=np.stack(self._joint_pos),
            mass=np.asarray(self._mass),
            com=np.stack(self._com),
            inertia=np.stack(self._inertia),
            geom_body=tuple(self._geom_body),
            geom_offset=(
                np.stack(self._geom_offset)
                if self._geom_offset
                else np.zeros((0, 3))
            ),
            geom_radius=np.asarray(self._geom_radius),
            damping=np.asarray(self._damping),
            armature=np.asarray(self._armature),
            gravity=self._gravity,
            **contact_params,
        )
