from estdepth_tpu.train.loss import multi_scale_loss
from estdepth_tpu.train.schedule import warmup_multistep_schedule

__all__ = ["multi_scale_loss", "warmup_multistep_schedule"]
