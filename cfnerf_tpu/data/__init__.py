from cfnerf_tpu.data.llff import load_llff_data, load_colmap_depth
from cfnerf_tpu.data.blender import load_blender_data
from cfnerf_tpu.data.sampler import RayBatcher, DepthRayBatcher, precompute_rays, lf_scene_splits
