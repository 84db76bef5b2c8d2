"""Population node spec for :class:`PopulationGraph`.

Capability parity with reference ``networks/graph/population.py:22-38``.
In the functional design the spec is hashable static metadata (it lives
in the graph module's treedef); parameters live only in connection
transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional


@dataclasses.dataclass(frozen=True)
class Population:
    """Node spec: declared size, optional transfer function, obs routing
    (``input_from``) and output exposure (``output_to``), plus the max
    outgoing delay (sizes the shared circular output buffer)."""

    name: str
    size: int
    activation: Optional[Callable]
    input_from: Optional[str]
    output_to: Optional[str]
    max_outgoing_delay: int = 0
