"""Fused per-voxel epipolar attention (Pallas TPU).

Computes the EST transformer's attention stage
(/root/reference/transformer/epipolar_transformer.py:62-73) in one VMEM
pass:

    corr_n  = sum_c target_key * warped_key_n          per voxel
    attn    = softmax_n(corr, masked by neighbor validity)
    h       = sum_n attn_n * warped_value_n / n_valid   (zero if none valid)

Kernel design (v5e): the channel dim C (16) is far below the 128-lane tile,
so a channels-minor layout wastes 8x of the VPU. Instead the (P, C) axes are
flattened into lanes — full utilization — and the per-voxel channel sum is a
log2(C) XOR-butterfly of lane gathers (`take_along_axis` with idx = lane ^ k,
the only gather form Mosaic supports), which leaves every lane of a voxel's
16-lane group holding the full correlation. That broadcast form is exactly
what the attention-weighted value product needs, so no compaction ever
happens. One program per S row (S = B*D folded); neighbor validity is a
scalar SMEM read per program.

Requires C to be a power of two <= 128 (it is 16 throughout the model);
other shapes fall back to the jnp reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def epipolar_attention_reference(
    target_key: jnp.ndarray,     # [S, P, C]
    warped_keys: jnp.ndarray,    # [N, S, P, C]
    warped_values: jnp.ndarray,  # [N, S, P, C]
    valid: jnp.ndarray,          # [N, S] bool
) -> jnp.ndarray:
    """jnp reference implementation (ground truth for the kernel)."""
    corr = jnp.sum(target_key[None] * warped_keys, axis=-1)  # [N,S,P]
    vmask = valid[:, :, None]
    logits = jnp.where(vmask, corr.astype(jnp.float32), _NEG_INF)
    attn = jax.nn.softmax(logits, axis=0)
    attn = jnp.where(vmask, attn, 0.0)
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32), axis=0), 1.0)
    h = jnp.sum(warped_values * attn[..., None].astype(warped_values.dtype), 0)
    return h / n_valid[:, None, None].astype(h.dtype)


def _kernel(valid_ref, tk_ref, wk_ref, wv_ref, out_ref, *, n: int, c: int):
    # tk_ref: [1, T, LT]; wk/wv_ref: [N, 1, T, LT]; valid_ref: [N, S] SMEM.
    s_idx = pl.program_id(0)
    tk = tk_ref[0].astype(jnp.float32)  # [T, LT]
    lanes = jax.lax.broadcasted_iota(jnp.int32, tk.shape, 1)

    def group_sum(x):
        # XOR butterfly: every lane ends up with the sum of its c-lane group
        k = 1
        while k < c:
            x = x + jnp.take_along_axis(x, lanes ^ k, axis=1)
            k *= 2
        return x

    corrs, vs = [], []
    for i in range(n):
        corr = group_sum(tk * wk_ref[i, 0].astype(jnp.float32))
        v = valid_ref[i, s_idx] > 0
        corrs.append(jnp.where(v, corr, _NEG_INF))
        vs.append(v)

    m = corrs[0]
    for corr in corrs[1:]:
        m = jnp.maximum(m, corr)
    exps = [jnp.exp(corr - m) for corr in corrs]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e

    n_valid = jnp.maximum(sum(v.astype(jnp.float32) for v in vs), 1.0)

    acc = jnp.zeros_like(tk)
    for i in range(n):
        w = jnp.where(vs[i], exps[i] / denom, 0.0)
        acc = acc + w * wv_ref[i, 0].astype(jnp.float32)
    out_ref[0] = (acc / n_valid).astype(out_ref.dtype)


def _lane_split(pc: int):
    """Factor P*C into (rows, 128): Mosaic's dynamic_gather requires the
    gather dimension to span a single 128-lane vreg."""
    if pc % 128 != 0:
        return None
    return pc // 128, 128


def epipolar_attention(
    target_key: jnp.ndarray,     # [S, P, C]
    warped_keys: jnp.ndarray,    # [N, S, P, C]
    warped_values: jnp.ndarray,  # [N, S, P, C]
    valid: jnp.ndarray,          # [N, S] bool
    interpret: bool = False,
) -> jnp.ndarray:
    n, s, p, c = warped_keys.shape
    pc = p * c
    split = _lane_split(pc)
    if split is None or (c & (c - 1)) != 0 or c > 128:
        return epipolar_attention_reference(
            target_key, warped_keys, warped_values, valid
        )
    t, lt = split

    tk = target_key.reshape(s, t, lt)
    wk = warped_keys.reshape(n, s, t, lt)
    wv = warped_values.reshape(n, s, t, lt)
    valid_i = valid.astype(jnp.int32)

    kernel = functools.partial(_kernel, n=n, c=c)
    out = pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full [N, S] valid
            pl.BlockSpec((1, t, lt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1, t, lt), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1, t, lt), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, lt), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, t, lt), warped_values.dtype),
        interpret=interpret,
    )(valid_i, tk, wk, wv)
    return out.reshape(s, p, c)
