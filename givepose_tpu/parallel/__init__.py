"""Parallelism utilities (device mesh, sharding, batch placement).

The reference has no distributed machinery (SURVEY.md §2.8: single GPU,
no NCCL/MPI); this package is the TPU-native scale-out layer: a 1-D
'data' mesh for batch parallelism with XLA-compiled gradient all-reduce
over ICI, extensible to ('data','model') axes.  Implementation lives in
givepose_tpu.core.mesh; re-exported here as the public surface.
"""

from givepose_tpu.core.mesh import (
    initialize_distributed,
    make_mesh,
    make_mesh_for_batch,
    data_sharding,
    process_local_indices,
    replicated,
    shard_batch,
    shard_host_batch,
)
