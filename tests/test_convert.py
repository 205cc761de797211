"""Torch checkpoint converter: literal reference names -> our param tree.

The torch key strings below are the exact state_dict names produced by the
reference module structure (networks/psm_submodule.py, torchvision resnet,
hybrid_depth_decoder.py, model_hybrid.py:58-60) — read from the sources, not
generated, so they anchor the mapping rules.
"""

import numpy as np

import jax

from estdepth_tpu.models import DepthNetHybrid
from estdepth_tpu.utils.convert import convert_state_dict
from estdepth_tpu.utils.checkpoint import partial_restore


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_spot_mappings():
    sd = {
        # PSM firstconv: Sequential(convbn, ReLU, convbn, ReLU, convbn, ReLU)
        "matchingFeature.firstconv.0.0.weight": np.zeros((32, 3, 3, 3)),
        "matchingFeature.firstconv.0.1.weight": np.ones(32),
        "matchingFeature.firstconv.0.1.bias": np.zeros(32),
        "matchingFeature.firstconv.0.1.running_mean": np.zeros(32),
        "matchingFeature.firstconv.0.1.running_var": np.ones(32),
        "matchingFeature.firstconv.4.0.weight": np.zeros((32, 32, 3, 3)),
        # PSM BasicBlock: conv1 = Seq(convbn, ReLU); conv2 = convbn
        "matchingFeature.layer2.0.conv1.0.0.weight": np.zeros((64, 32, 3, 3)),
        "matchingFeature.layer2.0.conv2.0.weight": np.zeros((64, 64, 3, 3)),
        "matchingFeature.layer2.0.conv2.1.running_var": np.ones(64),
        "matchingFeature.layer2.0.downsample.0.weight": np.zeros((64, 32, 1, 1)),
        "matchingFeature.branch1.1.0.weight": np.zeros((32, 128, 1, 1)),
        "matchingFeature.lastconv.0.0.weight": np.zeros((128, 320, 3, 3)),
        "matchingFeature.lastconv.2.weight": np.zeros((32, 128, 1, 1)),
        # torchvision resnet
        "semanticFeature.encoder.conv1.weight": np.zeros((64, 3, 7, 7)),
        "semanticFeature.encoder.bn1.weight": np.ones(64),
        "semanticFeature.encoder.layer1.0.conv2.weight": np.zeros((64, 64, 3, 3)),
        "semanticFeature.encoder.layer1.0.downsample.1.running_mean": np.zeros(256),
        "semanticFeature.encoder.fc.weight": np.zeros((1000, 2048)),
        # decoder
        "CostRegNet.upconv_4_0.conv.0.weight": np.zeros((256, 2048, 3, 3)),
        "CostRegNet.upconv_4_0.conv.1.bias": np.zeros(256),
        "CostRegNet.dispconv_1.weight": np.zeros((1, 32, 3, 3)),
        "CostRegNet.dispconv_1.bias": np.zeros(1),
        "CostRegNet.dres0.0.0.weight": np.zeros((32, 32, 3, 3, 3)),
        "CostRegNet.dres0.1.1.running_var": np.ones(32),
        "CostRegNet.dres2.0.0.weight": np.zeros((33, 33, 3, 3, 3)),
        "CostRegNet.key_layer.0.0.weight": np.zeros((16, 33, 3, 3, 3)),
        "CostRegNet.value_layer.0.1.weight": np.ones(16),
        "CostRegNet.stereo_head0.0.0.weight": np.zeros((16, 16, 3, 3, 3)),
        "CostRegNet.stereo_head0.1.weight": np.zeros((1, 16, 1, 1, 1)),
        "CostRegNet.stereo_head0.1.bias": np.zeros(1),
        "CostRegNet.epipolar_transformer.gate_conv.weight":
            np.zeros((32, 32, 3, 3, 3)),
        "CostRegNet.epipolar_transformer.reset_gate_norm.weight": np.ones(16),
        # cost aggregation
        "pre0.0.weight": np.zeros((32, 64, 1, 1, 1)),
        "pre0.1.running_mean": np.zeros(32),
        "pre2.0.weight": np.zeros((32, 32, 3, 3, 3)),
        # ignored
        "matchingFeature.firstconv.0.1.num_batches_tracked": np.array(0),
    }
    converted, unmatched = convert_state_dict(sd, strict=True)
    assert unmatched == []
    p = _flatten(converted["params"])
    bs = _flatten(converted["batch_stats"])

    assert p[("matching_feature", "firstconv_0", "conv", "kernel")].shape == \
        (3, 3, 3, 32)
    assert p[("matching_feature", "firstconv_2", "conv", "kernel")].shape == \
        (3, 3, 32, 32)
    assert p[("matching_feature", "layer2_0", "conv1", "conv", "kernel")].shape \
        == (3, 3, 32, 64)
    assert bs[("matching_feature", "layer2_0", "conv2", "bn", "var")].shape == \
        (64,)
    assert p[("matching_feature", "lastconv_1", "kernel")].shape == (1, 1, 128, 32)
    assert p[("semantic_feature", "conv1", "conv", "kernel")].shape == (7, 7, 3, 64)
    assert p[("semantic_feature", "conv1", "bn", "scale")].shape == (64,)
    assert ("semantic_feature", "fc", "kernel") not in p  # head skipped
    assert p[("decoder", "upconv_4_0", "conv", "conv", "kernel")].shape == \
        (3, 3, 2048, 256)
    assert p[("decoder", "dispconv_1", "kernel")].shape == (3, 3, 32, 1)
    assert p[("decoder", "dres0_0", "conv", "conv", "kernel")].shape == \
        (3, 3, 3, 32, 32)
    assert p[("decoder", "stereo_head0", "out", "kernel")].shape == \
        (1, 1, 1, 16, 1)
    assert p[("decoder", "stereo_head0", "conv0", "conv", "conv", "kernel")
             ].shape == (3, 3, 3, 16, 16)
    assert p[("decoder", "est", "gate_conv", "kernel")].shape == (3, 3, 3, 32, 32)
    assert p[("decoder", "est", "reset_gate_norm", "scale")].shape == (16,)
    assert p[("pre0", "conv", "kernel")].shape == (1, 1, 1, 64, 32)
    assert bs[("pre0", "bn", "mean")].shape == (32,)


def test_roundtrip_export_import_full_model():
    """export_state_dict(variables) -> convert_state_dict -> identical tree.

    Run on the full tiny model: proves BOTH mapping directions cover every
    parameter and statistic of the live module tree (no silent drops)."""
    import jax.numpy as jnp

    from estdepth_tpu.utils.convert import export_state_dict

    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=50, est_transformer=True
    )
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96, 3)).astype(np.float32))
    poses = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32)[None, None], (1, 3, 1, 1))
    )
    intr = jnp.asarray(np.eye(3, dtype=np.float32)[None] * 80)
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=True)
    )(jax.random.key(0), imgs, poses, intr)
    variables = jax.tree.map(np.asarray, dict(variables))

    sd = export_state_dict(variables)
    assert len(sd) > 300  # resnet50 + psm + decoder
    back, unmatched = convert_state_dict(sd, strict=True)
    assert unmatched == []

    want_p = _flatten(variables["params"])
    got_p = _flatten(back["params"])
    assert set(got_p) == set(want_p), (
        f"missing: {sorted(set(want_p) - set(got_p))[:5]} "
        f"extra: {sorted(set(got_p) - set(want_p))[:5]}"
    )
    for k in want_p:
        np.testing.assert_array_equal(got_p[k], want_p[k], err_msg=str(k))

    want_s = _flatten(variables["batch_stats"])
    got_s = _flatten(back["batch_stats"])
    assert set(got_s) == set(want_s)
    for k in want_s:
        np.testing.assert_array_equal(got_s[k], want_s[k], err_msg=str(k))


def test_converted_paths_exist_in_model():
    """Every converted path must exist (same name + shape) in the live model."""
    import jax.numpy as jnp

    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18, est_transformer=True
    )
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96, 3)).astype(np.float32))
    poses = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32)[None, None], (1, 3, 1, 1))
    )
    intr = jnp.asarray(np.eye(3, dtype=np.float32)[None] * 80)
    variables = model.init(jax.random.key(0), imgs, poses, intr, train=True)
    params_flat = _flatten(variables["params"])

    # convert a decoder-subset fake dict sized for this tiny model and check
    # the paths resolve against the real tree
    sd = {
        "CostRegNet.dres2.0.0.weight": np.zeros((33, 33, 3, 3, 3), np.float32),
        "CostRegNet.epipolar_transformer.output_conv.weight":
            np.zeros((16, 32, 3, 3, 3), np.float32),
        "CostRegNet.epipolar_transformer.output_conv.bias":
            np.zeros(16, np.float32),
        "pre1.0.weight": np.zeros((32, 32, 3, 3, 3), np.float32),
    }
    converted, _ = convert_state_dict(sd, strict=True)
    for path, arr in _flatten(converted["params"]).items():
        assert path in params_flat, f"converted path {path} missing in model"
        assert params_flat[path].shape == arr.shape, path

    # partial_restore merges them in and reports the hit count
    merged = partial_restore(variables["params"], converted["params"],
                             verbose=False)
    m = _flatten(merged)
    assert float(np.abs(m[("decoder", "dres2", "conv", "conv", "kernel")]).max()) \
        == 0.0


def test_torchvision_pretrained_import_covers_encoder():
    """convert_torchvision_resnet on a REAL torchvision-layout state_dict
    covers every leaf of ResNetEncoder(50) — the ImageNet-pretrained
    encoder init path (resnet_encoder.py:35)."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from estdepth_tpu.models.resnet import ResNetEncoder
    from estdepth_tpu.utils.convert import convert_torchvision_resnet
    from estdepth_tpu.utils.reference_runner import install_torchvision_stub

    install_torchvision_stub()
    import torchvision.models as tvm

    sd = {k: v.numpy() for k, v in tvm.resnet50().state_dict().items()}
    tree = convert_torchvision_resnet(sd)

    enc = ResNetEncoder(50)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = jax.jit(lambda r, a: enc.init(r, a, train=False))(
        jax.random.key(0), x
    )
    for col in ("params", "batch_stats"):
        want = _flatten(jax.tree.map(np.asarray, dict(variables))[col])
        got = _flatten(tree[col])
        assert set(got) == set(want), (
            f"{col} missing: {sorted(set(want) - set(got))[:5]} "
            f"extra: {sorted(set(got) - set(want))[:5]}"
        )
        for k in want:
            assert got[k].shape == want[k].shape, k


def test_flatten_npz_roundtrip(tmp_path):
    from estdepth_tpu.utils.convert import flatten_tree, unflatten_tree

    tree = {
        "a": {"b": np.arange(6).reshape(2, 3), "c": np.float32(1.5)},
        "d": np.ones(4),
    }
    path = str(tmp_path / "t.npz")
    np.savez(path, **flatten_tree(tree))
    back = unflatten_tree(dict(np.load(path)))
    for k, v in _flatten(tree).items():
        np.testing.assert_array_equal(_flatten(back)[k], v)


def test_loadckpt_torch_ckpt_full_restore(tmp_path):
    """Fine-tune-from-released-checkpoint flow: a reference-format torch
    .ckpt round-trips through load_weights_for_finetune + partial_restore
    with every leaf restored (train_hybrid.py:325-337)."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from estdepth_tpu.utils.checkpoint import load_weights_for_finetune
    from estdepth_tpu.utils.convert import export_state_dict

    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18,
        est_transformer=True,
    )
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(
        rng.uniform(0, 255, (1, 3, 64, 96, 3)).astype(np.float32)
    )
    poses = jnp.asarray(
        np.tile(np.eye(4, dtype=np.float32)[None, None], (1, 3, 1, 1))
    )
    intr = jnp.asarray(np.eye(3, dtype=np.float32)[None] * 80)
    variables = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=True)
    )(jax.random.key(1), imgs, poses, intr)
    variables = jax.tree.map(np.asarray, dict(variables))

    sd = export_state_dict(variables)
    ckpt_path = str(tmp_path / "model_000001.ckpt")
    torch.save(
        {"epoch": 1,
         "model": {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in sd.items()}},
        ckpt_path,
    )

    params_l, stats_l = load_weights_for_finetune(ckpt_path)
    # fresh differently-seeded init, then restore
    fresh = jax.jit(
        lambda r, i, p, k: model.init(r, i, p, k, train=True)
    )(jax.random.key(9), imgs, poses, intr)
    fresh = jax.tree.map(np.asarray, dict(fresh))
    merged_p = partial_restore(fresh["params"], params_l, verbose=False)
    merged_s = partial_restore(fresh["batch_stats"], stats_l, verbose=False)

    for k, v in _flatten(variables["params"]).items():
        np.testing.assert_array_equal(_flatten(merged_p)[k], v, err_msg=str(k))
    for k, v in _flatten(variables["batch_stats"]).items():
        np.testing.assert_array_equal(_flatten(merged_s)[k], v, err_msg=str(k))
