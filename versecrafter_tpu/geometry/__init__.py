from versecrafter_tpu.geometry.coords import (
    CV2BLENDER,
    blender_c2w_to_opencv_w2c,
    denormalize_intrinsics,
)
from versecrafter_tpu.geometry.pointcloud import unproject_depth
from versecrafter_tpu.geometry.gaussians import fit_gaussian
