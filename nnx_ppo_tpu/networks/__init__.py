from nnx_ppo_tpu.networks.adapter import PPOAdapter
from nnx_ppo_tpu.networks.containers import Concat, Parallel, Sequential, Splitter
from nnx_ppo_tpu.networks.factories import (
    make_mlp,
    make_mlp_actor_critic,
    make_mlp_layers,
)
from nnx_ppo_tpu.networks.delay import Delay
from nnx_ppo_tpu.networks.feedforward import Dense
from nnx_ppo_tpu.networks.normalizer import Normalizer
from nnx_ppo_tpu.networks.recurrent import GRU, LSTM
from nnx_ppo_tpu.networks.variational import (
    AR1VariationalBottleneck,
    VariationalBottleneck,
)
from nnx_ppo_tpu.networks.sampling_layers import ActionSampler, NormalTanhSampler
from nnx_ppo_tpu.networks.types import (
    ModuleOutput,
    ModuleState,
    PPONetworkOutput,
    StatefulModule,
    StatefulModuleOutput,
)
from nnx_ppo_tpu.networks.utils import Filter, Flattener, Map, Merge, Scale

__all__ = [
    "AR1VariationalBottleneck",
    "ActionSampler",
    "Concat",
    "Delay",
    "Dense",
    "GRU",
    "LSTM",
    "VariationalBottleneck",
    "Filter",
    "Flattener",
    "Map",
    "Merge",
    "ModuleOutput",
    "ModuleState",
    "NormalTanhSampler",
    "Normalizer",
    "PPOAdapter",
    "PPONetworkOutput",
    "Parallel",
    "Scale",
    "Sequential",
    "Splitter",
    "StatefulModule",
    "StatefulModuleOutput",
    "make_mlp",
    "make_mlp_actor_critic",
    "make_mlp_layers",
]
