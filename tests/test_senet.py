"""SE encoder family shapes (reference networks/senet*.py, unused-by-default
alternative matching encoder)."""

import numpy as np

import jax
import jax.numpy as jnp

from estdepth_tpu.models.senet import SEBottleneck, SEFeatureNet, SEModule

import pytest

# true-parity vs the actual networks/senet.py (senet154 et al)
pytestmark = pytest.mark.slow


def test_se_module_gates(rng):
    m = SEModule(16, reduction=4)
    x = jnp.array(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    # the gate is in (0,1): output magnitude never exceeds input
    assert float(jnp.max(jnp.abs(y) - jnp.abs(x))) <= 1e-6


def test_se_bottleneck_shapes(rng):
    m = SEBottleneck(32, stride=2, downsample=True, downsample_kernel=3)
    x = jnp.array(rng.normal(size=(1, 16, 16, 64)), jnp.float32)
    variables = m.init(jax.random.key(0), x, train=False)
    y = m.apply(variables, x, train=False)
    assert y.shape == (1, 8, 8, 128)
    assert float(jnp.min(y)) >= 0.0  # post-add ReLU


def test_se_feature_net(rng):
    m = SEFeatureNet()
    x = jnp.array(rng.normal(size=(1, 64, 96, 3)), jnp.float32)
    variables = m.init(jax.random.key(0), x, train=False)
    half, quarter = m.apply(variables, x, train=False)
    # (1/2-scale 128ch, 1/4-scale 32ch) — senet_submodule.py:119-142
    assert half.shape == (1, 32, 48, 128)
    assert quarter.shape == (1, 16, 24, 32)


def test_senet_constructors_features():
    """The six reference constructors (senet.py:395-452) build and their
    feature extractors produce stride-16 maps at the reference widths."""
    from estdepth_tpu.models.senet import (
        se_resnet50, se_resnext50_32x4d, senet154,
    )

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for ctor in (senet154, se_resnet50, se_resnext50_32x4d):
        m = ctor(pretrained=None)
        variables = jax.eval_shape(
            lambda mm=m: mm.init(jax.random.key(0), x, train=False,
                                 features_only=True)
        )
        out = jax.eval_shape(
            lambda v, mm=m: mm.apply(v, x, train=False, features_only=True),
            variables,
        )
        assert out.shape == (1, 4, 4, 2048), ctor.__name__


def test_senet_classifier_head():
    from estdepth_tpu.models.senet import se_resnet50

    m = se_resnet50(num_classes=10, pretrained=None)
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    variables = m.init(jax.random.key(0), x, train=False)
    logits = m.apply(variables, x, train=False)
    assert logits.shape == (1, 10)


def test_depthnet_senet_feature_net(rng):
    """DepthNetHybrid(feature_net='senet') runs end-to-end
    (model_hybrid.py:22 featureNet selection)."""
    from estdepth_tpu.models import DepthNetHybrid

    model = DepthNetHybrid(
        ndepths=8, depth_min=0.5, depth_max=8.0, resnet=18,
        feature_net="senet", est_transformer=True,
    )
    imgs = jnp.array(rng.uniform(0, 255, (1, 3, 64, 96, 3)), jnp.float32)
    poses = np.tile(np.eye(4, dtype=np.float32)[None, None], (1, 3, 1, 1))
    poses = jnp.array(poses)
    intr = jnp.array(
        [[[80.0, 0, 47.5], [0, 80.0, 31.5], [0, 0, 1]]], jnp.float32
    )
    variables = model.init(jax.random.key(0), imgs, poses, intr, train=False)
    out, state = model.apply(variables, imgs, poses, intr, train=False)
    assert out["depth"].shape == (1, 1, 4, 64, 96)
    assert np.isfinite(np.asarray(out["depth"])).all()


# ---------------------------------------------------------------------------
# True parity vs the ACTUAL reference networks/senet.py
# ---------------------------------------------------------------------------

def _senet_randomize(variables, seed=0):
    rng_ = np.random.default_rng(seed)

    def perturb(path, leaf):
        a = np.asarray(leaf)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "scale" and not a.any():
            return rng_.uniform(0.05, 0.15, a.shape).astype(np.float32)
        if name in ("scale", "var"):
            return rng_.uniform(0.8, 1.2, a.shape).astype(np.float32)
        if name == "mean":
            return rng_.normal(0.0, 0.05, a.shape).astype(np.float32)
        if name == "bias":
            return rng_.normal(0.0, 0.02, a.shape).astype(np.float32)
        return a

    return jax.tree_util.tree_map_with_path(perturb, variables)


def _senet_torch_state_dict(variables):
    """Our SENet variables -> reference torch state_dict names
    (networks/senet.py module tree)."""
    import re

    p = jax.tree.map(np.asarray, variables["params"])
    s = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    out = {}

    def conv_w(k):
        return np.transpose(k, (3, 2, 0, 1))

    def emit_bn(prefix, params_bn, stats_bn):
        out[f"{prefix}.weight"] = params_bn["scale"]
        out[f"{prefix}.bias"] = params_bn["bias"]
        out[f"{prefix}.running_mean"] = stats_bn["mean"]
        out[f"{prefix}.running_var"] = stats_bn["var"]

    def emit_convbn(conv_name, bn_name, node, snode):
        out[f"{conv_name}.weight"] = conv_w(node["conv"]["kernel"])
        emit_bn(bn_name, node["bn"], snode["bn"])

    for name, node in p.items():
        snode = s.get(name, {})
        m = re.match(r"layer0_conv(\d)$", name)
        if m:
            emit_convbn(f"layer0.conv{m.group(1)}",
                        f"layer0.bn{m.group(1)}", node, snode)
            continue
        m = re.match(r"layer(\d)_(\d+)$", name)
        if m:
            base = f"layer{m.group(1)}.{m.group(2)}"
            emit_convbn(f"{base}.conv1", f"{base}.bn1",
                        node["conv1"], snode["conv1"])
            out[f"{base}.conv2.weight"] = conv_w(node["conv2"]["kernel"])
            emit_bn(f"{base}.bn2", node["bn2"], snode["bn2"])
            emit_convbn(f"{base}.conv3", f"{base}.bn3",
                        node["conv3"], snode["conv3"])
            if "downsample" in node:
                out[f"{base}.downsample.0.weight"] = conv_w(
                    node["downsample"]["conv"]["kernel"]
                )
                emit_bn(f"{base}.downsample.1",
                        node["downsample"]["bn"], snode["downsample"]["bn"])
            for fc in ("fc1", "fc2"):
                out[f"{base}.se_module.{fc}.weight"] = conv_w(
                    node["se"][fc]["kernel"]
                )
                out[f"{base}.se_module.{fc}.bias"] = node["se"][fc]["bias"]
            continue
        if name == "last_linear":
            out["last_linear.weight"] = np.transpose(node["kernel"])
            out["last_linear.bias"] = node["bias"]

    return out


def _run_senet_parity(ctor_name, rng):
    import pytest

    torch = pytest.importorskip("torch")
    import estdepth_tpu.models.senet as ours
    from estdepth_tpu.utils.reference_runner import import_reference

    ref = import_reference()
    import importlib

    ref_senet = importlib.import_module("networks.senet")

    m = getattr(ours, ctor_name)(pretrained=None)
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    variables = jax.jit(
        lambda r, a: m.init(r, a, train=False, features_only=True)
    )(jax.random.key(0), jnp.asarray(x))
    variables = _senet_randomize(jax.device_get(dict(variables)))
    got = m.apply(variables, jnp.asarray(x), train=False, features_only=True)

    tm = getattr(ref_senet, ctor_name)(pretrained=None).eval()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in _senet_torch_state_dict(variables).items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected[:5]
    bad = [
        k for k in missing
        if "num_batches_tracked" not in k
        # features_only init never materializes the classifier head, and
        # tm.features() never runs it
        and not k.startswith("last_linear")
    ]
    assert not bad, bad[:5]

    with torch.no_grad():
        want = tm.features(torch.from_numpy(x).permute(0, 3, 1, 2))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=1e-3, atol=2e-4,
    )


def test_se_resnet50_matches_reference(rng):
    """SEResNetBottleneck + container vs actual senet.py:162-184,213-381."""
    _run_senet_parity("se_resnet50", rng)


def test_se_resnext50_matches_reference(rng):
    """SEResNeXtBottleneck (grouped conv) vs actual senet.py:186-210."""
    _run_senet_parity("se_resnext50_32x4d", rng)


def test_senet154_matches_reference(rng):
    """SEBottleneck (wide conv2) + 3x3 stem vs actual senet.py:138-160."""
    _run_senet_parity("senet154", rng)
