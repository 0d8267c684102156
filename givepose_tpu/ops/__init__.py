from givepose_tpu.ops.dcnv3 import dcnv3_core, dcnv3_sampling_locations
from givepose_tpu.ops.chamfer import chamfer_distances, nn_distance
from givepose_tpu.ops.resample import (
    resize_matrix,
    crop_resize_affine,
    affine_crop_params,
    get_2d_coord_grid,
)
