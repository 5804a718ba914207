from cfnerf_tpu.flows.sylvester import (
    triangular_sylvester_step,
    triangular_sylvester_stack,
    planar_step,
)
from cfnerf_tpu.flows.amortized import AmortizedTriangularSylvester, AmortizedPlanar
