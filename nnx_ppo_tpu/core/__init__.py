from nnx_ppo_tpu.core.struct import (
    combine,
    field,
    is_pytree_dataclass,
    param_mask,
    partition,
    partition_params,
    pytree_dataclass,
    static_field,
    tree_set_attr,
    tree_where,
)

__all__ = [
    "combine",
    "field",
    "is_pytree_dataclass",
    "param_mask",
    "partition",
    "partition_params",
    "pytree_dataclass",
    "static_field",
    "tree_set_attr",
    "tree_where",
]
