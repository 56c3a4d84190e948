from gazenerf_tpu.ops.embedding import embed_dim, positional_encoding
from gazenerf_tpu.ops.image import (
    blur3x3,
    pixel_shuffle2,
    resize_bilinear,
    upsample2x_blur,
)
from gazenerf_tpu.ops.integrate import (
    Integrated,
    exclusive_transmittance,
    integrate_rays,
)
from gazenerf_tpu.ops.rays import (
    RayBundle,
    SampleSet,
    generate_rays,
    pixel_grid,
    sample_coarse,
    sample_fine,
    stratified_zvals,
)
from gazenerf_tpu.ops.rotation import (
    angular_error_deg,
    euler_to_rotation,
    gaze_rotation_matrices,
    pitchyaw_to_vector,
    rotate_feature_planes,
    rotation_to_euler,
)

__all__ = [
    "embed_dim",
    "positional_encoding",
    "blur3x3",
    "pixel_shuffle2",
    "resize_bilinear",
    "upsample2x_blur",
    "Integrated",
    "exclusive_transmittance",
    "integrate_rays",
    "RayBundle",
    "SampleSet",
    "generate_rays",
    "pixel_grid",
    "sample_coarse",
    "sample_fine",
    "stratified_zvals",
    "angular_error_deg",
    "euler_to_rotation",
    "gaze_rotation_matrices",
    "pitchyaw_to_vector",
    "rotate_feature_planes",
    "rotation_to_euler",
]
