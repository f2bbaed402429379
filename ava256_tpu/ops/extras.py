# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Auxiliary NN layers completing the reference's layer library
(reference: models/utils.py:148-249,520-531): binomial-blur downsampling,
dilation, coordinate-conditioned conv, NFNet weight standardization, and
weight-norm fusing for inference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ava256_tpu.ops.layers import _as_pair


_BINOMIAL = np.array([1.0, 6.0, 15.0, 20.0, 15.0, 6.0, 1.0], np.float32)


def downsample2d(
    x: jnp.ndarray, stride: int = 1, padding: Union[int, str] = 0
) -> jnp.ndarray:
    """Depthwise 7x7 binomial blur (+ optional stride), NHWC."""
    k1 = _BINOMIAL
    k = k1[:, None] * k1[None, :]
    k = k / k.sum()
    c = x.shape[-1]
    kernel = jnp.asarray(np.tile(k[:, :, None, None], (1, 1, 1, c)), x.dtype)
    if padding == "reflect":
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        pad = [(0, 0), (0, 0)]
    else:
        pad = [(padding, padding)] * 2
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def dilate2d(
    x: jnp.ndarray, kernel_size: int, stride: int = 1, padding: int = 0
) -> jnp.ndarray:
    """Depthwise box filter clamped at 1 (mask dilation), NHWC."""
    c = x.shape[-1]
    k = np.ones((kernel_size, kernel_size), np.float32)
    k /= k.sum()
    kernel = jnp.asarray(np.tile(k[:, :, None, None], (1, 1, 1, c)), x.dtype)
    out = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return jnp.clip(out, a_max=1.0)


class CoordConv2d(nn.Module):
    """Conv with normalized (y, x) coordinate channels appended to the input."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, _ = x.shape
        ys = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)
        xs = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)
        yg = jnp.broadcast_to(ys[None, :, None, None], (n, h, w, 1))
        xg = jnp.broadcast_to(xs[None, None, :, None], (n, h, w, 1))
        x = jnp.concatenate([x, yg, xg], axis=-1)
        from ava256_tpu.ops.layers import Conv2d

        return Conv2d(
            self.features, self.kernel_size, self.strides, self.padding,
            dtype=self.dtype,
        )(x)


class Conv2dWS(nn.Module):
    """Weight-standardized conv (NFNet-style): per-output-channel standardized
    kernel scaled by sqrt(2)/sqrt(fan_in var) and a learned gain."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    eps: float = 1e-4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _as_pair(self.kernel_size)
        sh, sw = _as_pair(self.strides)
        ph, pw = _as_pair(self.padding)
        in_features = x.shape[-1]
        fan_in = kh * kw * in_features
        w = self.param(
            "weight",
            nn.initializers.he_normal(),
            (kh, kw, in_features, self.features),
        )
        gain = self.param("gain", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))

        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        scale = (
            1.414
            * jax.lax.rsqrt(jnp.maximum(var * fan_in, self.eps))
            * gain[None, None, None, :]
        )
        w_eff = (w - mean) * scale
        y = jax.lax.conv_general_dilated(
            x, w_eff.astype(self.dtype or x.dtype), (sh, sw),
            [(ph, ph), (pw, pw)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(y.dtype)


def fuse_weightnorm(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold weight-norm scales into the kernels for inference.

    Equivalent to the reference layers' ``fuse()`` (reference:
    models/utils.py:135-138,346-349): every {weight, g} pair becomes
    weight * g / ||weight||_F with g removed. Works on any params pytree.
    """

    def fold(tree):
        if isinstance(tree, dict):
            if "weight" in tree and "g" in tree:
                w = tree["weight"]
                g = tree["g"]
                shape = [1] * w.ndim
                shape[-1 if w.ndim != 2 else 1] = -1
                wnorm = jnp.sqrt(jnp.sum(w.astype(jnp.float32) ** 2))
                out = {
                    k: v for k, v in tree.items() if k != "g"
                }
                out["weight"] = w * (g.reshape(shape) / wnorm).astype(w.dtype)
                return out
            return {k: fold(v) for k, v in tree.items()}
        return tree

    return fold(params)
