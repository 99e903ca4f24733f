from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    param_pspec,
    params_pspec_tree,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "param_pspec",
    "params_pspec_tree",
    "shard_params",
]
