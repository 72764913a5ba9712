"""SPMD scaling: device meshes, replica/time sharding, collectives."""

from .mesh import P, make_mesh, replica_sharding, shard_replicas
from .pipelined import lgssm_smooth_pipelined
from .time_sharded import lgssm_smooth_time_sharded, mv_lgssm_smooth_time_sharded
from .streaming import StreamingSession, stream_filter
from .reductions import all_converged, global_sum

__all__ = [
    "make_mesh",
    "replica_sharding",
    "shard_replicas",
    "P",
    "lgssm_smooth_pipelined",
    "lgssm_smooth_time_sharded",
    "mv_lgssm_smooth_time_sharded",
    "StreamingSession",
    "stream_filter",
    "global_sum",
    "all_converged",
]
