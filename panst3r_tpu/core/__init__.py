from panst3r_tpu.core.mesh import MeshSpec, build_mesh
from panst3r_tpu.core.bucketing import (
    Bucket,
    bucket_for_shape,
    landscape_shape,
    micro_batched,
    transpose_to_landscape,
)
