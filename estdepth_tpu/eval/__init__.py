from estdepth_tpu.eval.metrics import depth_metrics
from estdepth_tpu.eval import metric_offline

__all__ = ["depth_metrics", "metric_offline"]
