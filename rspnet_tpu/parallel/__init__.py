"""Distributed runtime: mesh construction and collectives helpers.

TPU-native replacement for the reference's NCCL/DDP layer (SURVEY.md §2.8,
§5.8): a 1-D ``data`` mesh over all chips; the train step is compiled once
with shard_map; gradients psum over the mesh; eager NCCL calls become XLA
collectives inside the step.
"""
from .mesh import (create_mesh, create_mesh_2d, data_parallel_specs,
                   fetch_global, fetch_scalar,
                   init_distributed, local_shard, mesh_for_args,
                   mesh_for_config,
                   replicate_to_mesh, shard_batch, time_enqueued)

__all__ = ["create_mesh", "create_mesh_2d", "shard_batch",
           "replicate_to_mesh",
           "data_parallel_specs", "local_shard", "init_distributed",
           "mesh_for_args", "mesh_for_config", "fetch_global", "fetch_scalar",
           "time_enqueued"]
