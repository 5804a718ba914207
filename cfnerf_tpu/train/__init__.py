from cfnerf_tpu.train.loss import kde_nll, depth_loss, total_loss
