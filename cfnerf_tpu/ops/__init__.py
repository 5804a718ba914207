from cfnerf_tpu.ops.embed import Embedder, get_embedder, positional_encoding
from cfnerf_tpu.ops.rays import (
    get_rays,
    get_rays_np,
    get_rays_by_coord_np,
    get_ray_directions,
    ndc_rays,
)
from cfnerf_tpu.ops.sampling import (
    cf_nerf_t_vals,
    sample_z_vals,
    stratified_perturb,
    sample_pdf,
)
from cfnerf_tpu.ops.compositing import raw2outputs
from cfnerf_tpu.ops.metrics import img2mse, mse2psnr, to8b, sparsification_plot, ssim
