"""Model zoo re-exports, resolved lazily (PEP 562).

Lazy so that light-weight consumers — notably the serving load path
(estdepth_tpu/serving.py), which needs only the ESTMemory pytree — don't
pay the import of the full model zoo (flax.linen modules, decoder, EST
transformer, encoders) just to touch one name.
"""

import importlib

_EXPORTS = {
    "DepthNetHybrid": "estdepth_tpu.models.estdepth",
    "ESTMemory": "estdepth_tpu.models.memory",
    "PSMFeatureNet": "estdepth_tpu.models.psm",
    "ResNetEncoder": "estdepth_tpu.models.resnet",
    "EpipolarTransformer": "estdepth_tpu.models.est_transformer",
    "DepthHybridDecoder": "estdepth_tpu.models.decoder",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    try:
        module = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    return getattr(importlib.import_module(module), name)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
