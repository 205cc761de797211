from estdepth_tpu.utils.logging import DictAverageMeter, ScalarLogger
from estdepth_tpu.utils.viz import colorize_depth, colorize_probmap

__all__ = [
    "DictAverageMeter",
    "ScalarLogger",
    "colorize_depth",
    "colorize_probmap",
]
