from .inference import make_sharded_stream_step
from .pipeline import PipelinedRTDETR, PipelinedYOLO
from .sharding import (batch_sharding, make_mesh, param_shardings, replicated,
                       shard_pytree)
from .spatial import make_spatial_forward, spatial_sharding

__all__ = ["make_mesh", "batch_sharding", "replicated", "param_shardings",
           "shard_pytree", "make_sharded_stream_step", "PipelinedYOLO",
           "make_spatial_forward", "spatial_sharding", "PipelinedRTDETR"]
