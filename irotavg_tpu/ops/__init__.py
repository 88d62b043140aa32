"""L3a compute kernels (JAX/XLA; Pallas where it pays).

Dense, batched re-designs of the reference's per-pixel C++ loops
(src/ORBExtractor.cpp): separable Gaussian blur, chained bilinear pyramid,
FAST-9/16 corner score maps, intensity-centroid orientation, steered BRIEF
descriptors, and XOR+popcount Hamming distance matrices.
"""

from irotavg_tpu.ops.image import (  # noqa: F401
    gaussian_blur7,
    pad_reflect101,
    pyramid_sizes,
    resize_bilinear,
)
from irotavg_tpu.ops.fast import (  # noqa: F401
    FAST_OFFSETS,
    fast_score_map,
    nms3,
)
from irotavg_tpu.ops.orient import ic_angles, orb_disc_mask  # noqa: F401
from irotavg_tpu.ops.brief import steered_brief  # noqa: F401
from irotavg_tpu.ops.hamming import hamming_matrix, popcount32  # noqa: F401
from irotavg_tpu.ops.orb_pattern import ORB_PATTERN  # noqa: F401
