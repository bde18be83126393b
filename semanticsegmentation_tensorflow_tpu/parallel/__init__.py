"""Parallelism: device mesh construction, batch sharding, collectives.

The reference is single-process single-device; multi-chip data-parallel
training over ICI is a framework requirement (BASELINE.json config 5). The
design is mesh-size-agnostic: the same code runs on 1 real TPU chip, a v5e
pod slice, or N fake CPU devices in tests.
"""

from semanticsegmentation_tensorflow_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    shard_batch,
    replicate,
    batch_spec,
    round_up_to_mesh,
    DATA_AXIS,
    SPATIAL_AXIS,
    zero1_spec,
    shard_state_zero1,
    state_specs_zero1,
)
from semanticsegmentation_tensorflow_tpu.parallel.launch import (  # noqa: F401
    initialize_distributed,
    is_primary,
    primary_print,
    barrier,
)
