from planedepth_tpu.geometry.camera import (
    BASELINE,
    FX_NORM,
    NORMALIZED_K,
    STEREO_SCALE_FACTOR,
    backproject_depth,
    create_camera_plane,
    depth_to_disp,
    disp_to_depth,
    identity_norm_grid,
    pixel_grid,
    pixel_intrinsics,
    project_3d,
)
from planedepth_tpu.geometry.planes import PlaneVolume, build_plane_volume
from planedepth_tpu.geometry.pose import (
    apply_rc,
    get_translation_matrix,
    rc_correction,
    rot_from_axisangle,
    transformation_from_parameters,
)
from planedepth_tpu.geometry.warp import (
    depth_warp_coords,
    disp_warp_coords,
    disp_warp_shift,
    homography_warp_coords,
)
