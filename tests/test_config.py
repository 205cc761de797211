"""Config dataclasses: canonical defaults mirror the reference protocol."""

from estdepth_tpu.config import Config, default_config, tiny_config


def test_defaults_match_reference_protocol():
    c = default_config()
    # model_hybrid.py:15-16, data/scannet.py:62, train_hybrid.sh
    assert c.model.ndepths == 64
    assert (c.data.height, c.data.width) == (256, 320)
    assert c.data.n_frames == 5
    assert c.data.frame_interval == 10
    assert c.train.lr == 4e-5
    assert c.train.weight_decay == 4e-4
    assert c.train.clip_early == 10.0 and c.train.clip_late == 1.0
    assert c.eval.lwindow == 3 and c.eval.memory_size == 2
    # metric.py:4 scoring range
    assert (c.eval.eval_depth_min, c.eval.eval_depth_max) == (0.3, 5.0)
    # depth interval formula (model_hybrid.py:29)
    expected = (c.model.depth_max - c.model.depth_min) / (c.model.ndepths - 1)
    assert abs(c.model.depth_interval - expected) < 1e-12


def test_tiny_config():
    c = tiny_config()
    assert c.model.ndepths == 8
    assert c.data.height % 32 == 0 and c.data.width % 32 == 0
    assert isinstance(c, Config)
