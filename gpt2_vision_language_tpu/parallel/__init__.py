from .mesh import make_mesh, batch_sharding, replicated, shard_batch, local_world
from .sharding import (
    gpt2_param_specs,
    replicated_specs,
    seq_parallel_sharding,
    shard_params,
)
from .pipeline import (
    make_pipeline_loss_fn,
    pipeline_param_pspecs,
    pipeline_run_blocks,
    stage_param_specs,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "local_world",
    "gpt2_param_specs",
    "replicated_specs",
    "seq_parallel_sharding",
    "shard_params",
    "make_pipeline_loss_fn",
    "pipeline_param_pspecs",
    "pipeline_run_blocks",
    "stage_param_specs",
]
