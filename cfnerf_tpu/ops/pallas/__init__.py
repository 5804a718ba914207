from cfnerf_tpu.ops.pallas.flow_stack import fused_flow_stack
