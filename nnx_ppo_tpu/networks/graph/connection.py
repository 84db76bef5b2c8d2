"""Connection edge spec for :class:`PopulationGraph`.

Capability parity with reference ``networks/graph/connection.py:19-34``.
The (src, dst, delay) routing is hashable static metadata; the
``transform`` module (with its parameters) is stored separately in the
graph's ``transforms`` data field, indexed by edge position.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Connection:
    """Edge spec: src/dst population names and integer step delay
    (0 = same-step, guaranteed valid by topological ordering)."""

    src: str
    dst: str
    delay: int

    def __post_init__(self):
        if self.delay < 0:
            raise ValueError(f"delay must be >= 0, got {self.delay}")
