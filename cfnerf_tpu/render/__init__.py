from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays, render_image
