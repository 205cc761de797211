from estdepth_tpu.models.estdepth import DepthNetHybrid
from estdepth_tpu.models.memory import ESTMemory
from estdepth_tpu.models.psm import PSMFeatureNet
from estdepth_tpu.models.resnet import ResNetEncoder
from estdepth_tpu.models.est_transformer import EpipolarTransformer
from estdepth_tpu.models.decoder import DepthHybridDecoder

__all__ = [
    "DepthNetHybrid",
    "ESTMemory",
    "PSMFeatureNet",
    "ResNetEncoder",
    "EpipolarTransformer",
    "DepthHybridDecoder",
]
