"""Lane-packed 3D convolution: fill the MXU's output lanes for small C_out.

Why: every hot conv3d in the decoder's matching stack has 16-33 output
channels (cost-volume aggregation, dres chain, key/value heads — see
/root/reference/hybrid_models/hybrid_depth_decoder.py:41-136 for the
reference widths we mirror). On TPU a convolution lowers to MXU matmuls
whose N dimension is C_out: at C_out=32 only a quarter of the 128 output
lanes do work, so the op runs at <=25% of matmul peak no matter how well
everything else is scheduled. This file's transform packs `p` horizontally
adjacent output pixels into the N dimension:

    out[..., w, co]  ==  packed_out[..., w // p, (w % p) * C_out + co]

computed by ONE strided conv with a widened kernel:

    window_strides = (1, 1, p)
    kernel         = [kd, kh, kw + p - 1, C_in, p * C_out]
    kernel[kd, kh, dx + kw_orig, ci, dx * C_out + co] = W[kd, kh, kw_orig, ci, co]

(all other taps zero), followed by a reshape that merges (W/p, p) back
into W. This is EXACTLY the same arithmetic — each output pixel still sums
the same kd*kh*kw*C_in products; the extra taps multiply by structural
zeros — but the matmul now has N = p * C_out lanes. MXU-time model
(M * ceil(K/128) passes): a 3x3x3 32->32 conv at [1,64,64,80] goes from
327680 * ceil(864/128) = 2.29M row-passes at 25% lane fill to
81920 * ceil(1728/128) = 1.15M at 100% — ~2x; 33->16 with p=8 is ~2.3x.
The K-dim zero padding (the widened kernel) costs exactly the factor the
N-fill recovers twice over.

SAME-padding bookkeeping: output block w4 covers pixels p*w4 .. p*w4+p-1
and reads inputs p*w4 - pad .. p*w4 + kw-1+p-1 - pad; with stride p the
window start is p*w4 - pad_left, so pad_left = pad_right = kw // 2 — the
ORIGINAL padding, unchanged (the widened kernel's extra reach is absorbed
by the stride).

Numerics: bit-exact modulo float summation order (the conv contraction
order is unspecified in XLA anyway); adding structural zeros is exact in
any float format. Pinned by tests/test_packed_conv.py against nn.Conv.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def choose_pack(features: int, width: int, max_pack: int = 16) -> int:
    """Largest power-of-two p <= min(max_pack, 128 // features) dividing
    `width`; 1 means packing is off (already >=128 lanes, or no divisor)."""
    if features >= 128:
        return 1
    p = 1
    while (
        p * 2 <= max_pack
        and (p * 2) * features <= 128
        and width % (p * 2) == 0
    ):
        p *= 2
    return p


def pack_kernel3d(kernel: jnp.ndarray, p: int) -> jnp.ndarray:
    """[kd, kh, kw, ci, co] -> banded [kd, kh, kw + p - 1, ci, p * co]."""
    kd, kh, kw, ci, co = kernel.shape
    out = jnp.zeros((kd, kh, kw + p - 1, ci, p, co), kernel.dtype)
    for dx in range(p):  # static; p tiny dynamic-update-slices per trace
        out = out.at[:, :, dx : dx + kw, :, dx, :].set(kernel)
    return out.reshape(kd, kh, kw + p - 1, ci, p * co)


def lane_packed_conv3d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    p: int,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """SAME-padding stride-1 conv3d of [B, D, H, W, Ci] by [kd, kh, kw, Ci, Co]
    evaluated as a lane-packed strided conv (see module docstring).

    Requires W % p == 0 and odd kw (or kw == 1). p == 1 falls back to the
    plain conv."""
    kd, kh, kw, ci, co = kernel.shape
    b, d, h, w, _ = x.shape
    if p > 1:
        assert w % p == 0, (w, p)
        assert kw % 2 == 1, kw
        kernel = pack_kernel3d(kernel, p)
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1, p),
        padding=[(kd // 2,) * 2, (kh // 2,) * 2, (kw // 2,) * 2],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if p > 1:
        out = out.reshape(b, d, h, w, co)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
