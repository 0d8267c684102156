from givepose_tpu.prep.pose_data import (
    align_instance,
    annotate_image,
    annotate_split,
    load_depth_png,
)
from givepose_tpu.prep.shape_data import (
    load_obj,
    sample_surface,
    normalize_to_nocs,
    save_model_points,
    voxelize,
)
from givepose_tpu.prep.shape_prior import PointCloudAE, train_shape_prior
from givepose_tpu.prep.renderer import render_points, nocs_cube_points
from givepose_tpu.prep.gen_pts import (
    backproject_depth,
    generate_point_labels,
    instance_point_labels,
    label_points,
)
from givepose_tpu.prep.occupancy import (
    extract_face_sketch,
    get_sketch_from_face_ray,
    save_occupancy,
    voxelize_object,
)
