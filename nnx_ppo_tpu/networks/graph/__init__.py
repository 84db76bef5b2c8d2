from nnx_ppo_tpu.networks.graph.connection import Connection
from nnx_ppo_tpu.networks.graph.graph import (
    PopulationGraph,
    PopulationGraphBuilder,
)
from nnx_ppo_tpu.networks.graph.population import Population

__all__ = [
    "Connection",
    "Population",
    "PopulationGraph",
    "PopulationGraphBuilder",
]
