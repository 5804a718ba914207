from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.models.nerf import NeRF, NeRFDropout, NeRFWild
