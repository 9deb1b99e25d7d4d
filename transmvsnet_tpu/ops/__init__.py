from transmvsnet_tpu.ops.sampling import (
    bilinear_sample,
    grid_sample,
    resize_bilinear,
    resize_nearest,
    upsample_nearest_2x,
)
from transmvsnet_tpu.ops.geometry import (
    fuse_projection,
    warp_coords,
    stage_depth_samples,
)
from transmvsnet_tpu.ops.warp import homo_warp, warp_correlate
