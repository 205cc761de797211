"""ConvBN's tri-state conv3d_as2d ("train_only") — the round-4 prestack
execution strategy (models/estdepth.py setup): the cost-volume prestack
runs the native conv3d form in eval and the depth-shifted-conv2ds form
under train, selected per call. Both forms bind the identical
"conv"/kernel parameter, so one init/checkpoint serves either; both are
exact decompositions of the same arithmetic, so outputs agree to float
noise across all three flag values.
"""
import jax
import jax.numpy as jnp

from estdepth_tpu.models.layers import ConvBN


def _mk(flag):
    return ConvBN(12, (3, 3, 3), 1, act="relu", conv3d_as2d=flag)


def test_train_only_param_tree_matches_both_forms():
    x = jnp.ones((2, 5, 6, 7, 4))
    trees = {}
    for flag in (False, True, "train_only"):
        v = _mk(flag).init(jax.random.key(0), x)
        trees[flag] = jax.tree.map(lambda a: (a.shape, a.dtype), v)
    assert trees[False] == trees[True] == trees["train_only"]


def test_train_only_selects_form_per_call():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 6, 7, 4))
    variables = _mk(False).init(jax.random.key(0), x)

    # eval: identical arithmetic to the native form (same program)
    y_native = _mk(False).apply(variables, x)
    y_tri = _mk("train_only").apply(variables, x)
    assert jnp.allclose(y_tri, y_native, atol=0, rtol=0)

    # train: matches the as2d form (exact decomposition -> float noise),
    # including the BN running-stats update
    y_as2d, s_as2d = _mk(True).apply(
        variables, x, True, mutable=["batch_stats"])
    y_tri_t, s_tri = _mk("train_only").apply(
        variables, x, True, mutable=["batch_stats"])
    assert jnp.allclose(y_tri_t, y_as2d, atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_tri), jax.tree.leaves(s_as2d)):
        assert jnp.allclose(a, b, atol=1e-6)
