"""SE encoder family shapes (reference networks/senet*.py, unused-by-default
alternative matching encoder)."""

import numpy as np

import jax
import jax.numpy as jnp

from estdepth_tpu.models.senet import SEBottleneck, SEFeatureNet, SEModule


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
