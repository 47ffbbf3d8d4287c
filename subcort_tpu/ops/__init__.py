from subcort_tpu.ops.normalize import (normalize_nonzero,  # noqa: F401
                                       normalize_stats)
from subcort_tpu.ops.patches import (  # noqa: F401
    PATCH,
    HALF,
    gather_atlas_vectors,
    gather_triplanar,
    pad_volume,
)
from subcort_tpu.ops.sampling import (  # noqa: F401
    balanced_negative_sample,
    get_mask_voxels,
    shuffle_consistent,
)
