from estdepth_tpu.data.synthetic import SyntheticSceneConfig, synthetic_window

__all__ = ["SyntheticSceneConfig", "synthetic_window"]
