"""SPMD scaling: device meshes, replica/time sharding, collectives."""

from .mesh import P, make_mesh, replica_sharding, shard_replicas
from .time_sharded import lgssm_smooth_time_sharded

__all__ = [
    "make_mesh",
    "replica_sharding",
    "shard_replicas",
    "P",
    "lgssm_smooth_time_sharded",
]
