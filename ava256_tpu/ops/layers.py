# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Weight-normalized NN layers (Flax linen, NHWC, TPU-native).

Re-implements the reference's layer library semantics (reference:
models/utils.py:15-125,129-145,252-267,338-374):

- Weight normalization: the effective weight is ``w * g[oc] / ||w||_F`` where
  the norm is the Frobenius norm of the *entire* weight tensor and ``g`` is a
  per-output-channel scale initialized to ``||w_init||_F`` (so the layer is an
  identity reparameterization at init).
- Initialization: Xavier-uniform with an explicit gain, where the fan-in
  kernel size for transposed convs is divided by the stride
  (reference: models/utils.py:15-66), and transposed convs get a blockwise
  (parity-constant) kernel so that their output has no stride-2 checkerboard
  at init (reference: models/utils.py:85-89).

Everything is NHWC / HWIO — the layouts XLA maps best onto the TPU MXU.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch.nn.init.calculate_gain("leaky_relu", 0.2)
LEAKY_GAIN = math.sqrt(2.0 / (1.0 + 0.2 * 0.2))


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def _as_pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def xavier_uniform_init(
    gain: float, fan_in: int, fan_out: int, ksize: int
) -> Callable[..., jnp.ndarray]:
    """Uniform(-a, a) with a = gain * sqrt(2 / ((n1 + n2) * ksize)) * sqrt(3)."""
    std = gain * math.sqrt(2.0 / ((fan_in + fan_out) * ksize))
    a = std * math.sqrt(3.0)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


def _wn_scale_init(weight: jnp.ndarray, features: int) -> Callable[..., jnp.ndarray]:
    """g initialized to the Frobenius norm of the freshly sampled weight."""
    def init(key, dtype=jnp.float32):
        norm = jnp.sqrt(jnp.sum(jax.lax.stop_gradient(weight.astype(jnp.float32)) ** 2))
        return (norm * jnp.ones((features,))).astype(dtype)

    return init


def _wn_effective(weight: jnp.ndarray, g: jnp.ndarray, channel_axis: int) -> jnp.ndarray:
    wnorm = jnp.sqrt(jnp.sum(weight.astype(jnp.float32) ** 2))
    shape = [1] * weight.ndim
    shape[channel_axis] = -1
    return weight * (g.reshape(shape) / wnorm).astype(weight.dtype)


class LinearWN(nn.Module):
    """Weight-normalized dense layer. Input [..., in] -> [..., features]."""

    features: int
    gain: float = 1.0
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            xavier_uniform_init(self.gain, in_features, self.features, 1),
            (in_features, self.features),
        )
        g = self.param("g", _wn_scale_init(w, self.features))
        w_eff = _wn_effective(w, g, channel_axis=1)
        y = jnp.dot(x, w_eff.astype(self.dtype or x.dtype))
        y = y.astype(self.dtype or x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


def _conv_s2d_4x4s2(x: jnp.ndarray, w_eff: jnp.ndarray) -> jnp.ndarray:
    """4x4 / stride-2 / pad-1 conv as ONE space-to-depth im2col matmul.

    The TPU conv lowering accumulates one [pixels, C_in] x [C_in, C_out]
    matmul per kernel tap; with C_in of 3..32 each tap is lane-padded up to
    42x on the 128-lane MXU (the identity/expression encoders' first UNet
    levels — the dominant non-march step cost, stepbudget_r3). Folding the
    stride-2 lattice into channels (space-to-depth) and the 2x2 remaining
    window into an im2col axis turns the whole conv into a single
    [pixels, 16*C_in] x [16*C_in, C_out] matmul: 48 wide at C_in=3 instead
    of sixteen 3-wide accumulations. Bitwise-equal weights; only the
    contraction order changes (float-associativity-level differences).
    """
    n, h, w, c = x.shape
    f = w_eff.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 2, w + 2
    # S[u, v, (py, px, ci)] = xp[2u + py, 2v + px, ci]
    s = (
        xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hp // 2, wp // 2, 4 * c)
    )
    # out[o] = sum_k W[k] xp[2o + k]; with k = 2u + p the 4x4 window becomes
    # the 2x2 neighborhood of S: patches[(uy, ux, py, px, ci)].
    patches = jnp.concatenate(
        [s[:, :-1, :-1], s[:, :-1, 1:], s[:, 1:, :-1], s[:, 1:, 1:]], axis=-1
    )
    # w[ky, kx, ci, co] -> [(uy, ux, py, px, ci), co]
    w2 = (
        w_eff.reshape(2, 2, 2, 2, c, f)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(16 * c, f)
    )
    return jnp.einsum("nhwk,kf->nhwf", patches, w2)


class Conv2dWN(nn.Module):
    """Weight-normalized 2D conv, NHWC in / NHWC out, HWIO kernel.

    ``s2d=True`` (only valid for kernel 4, stride 2, padding 1, even input)
    computes the identical conv via a space-to-depth im2col matmul — exact
    same parameters/init, MXU-efficient at small channel counts (see
    :func:`_conv_s2d_4x4s2`).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    gain: float = 1.0
    use_bias: bool = True
    dtype: Optional[Any] = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        kh, kw = _as_pair(self.kernel_size)
        sh, sw = _as_pair(self.strides)
        ph, pw = _as_pair(self.padding)
        in_features = x.shape[-1]

        w = self.param(
            "weight",
            xavier_uniform_init(self.gain, in_features, self.features, kh * kw),
            (kh, kw, in_features, self.features),
        )
        g = self.param("g", _wn_scale_init(w, self.features))
        w_eff = _wn_effective(w, g, channel_axis=3)
        w_eff = w_eff.astype(self.dtype or x.dtype)

        if self.s2d:
            if (kh, kw, sh, sw, ph, pw) != (4, 4, 2, 2, 1, 1):
                raise ValueError("s2d path requires kernel 4, stride 2, padding 1")
            if x.shape[1] % 2 or x.shape[2] % 2:
                raise ValueError("s2d path requires even spatial dims")
            y = _conv_s2d_4x4s2(x, w_eff).astype(self.dtype or x.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                w_eff,
                window_strides=(sh, sw),
                padding=[(ph, ph), (pw, pw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(self.dtype or x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


def _blockwise_deconv_init(
    gain: float, fan_in: int, fan_out: int, k: Tuple[int, int], s: Tuple[int, int]
) -> Callable[..., jnp.ndarray]:
    """Xavier-uniform then made parity-constant across the stride lattice.

    Sampling a base kernel of shape [kh/sh, kw/sw] and nearest-upsampling by
    the stride reproduces the reference's blockwise overwrite
    (reference: models/utils.py:85-89) in distribution: every stride-parity
    block of the kernel is identical, so the transposed conv writes the same
    value to all sub-pixel phases at init.
    """
    kh, kw = k
    sh, sw = s
    ksize = (kh * kw) // (sh * sw)
    std = gain * math.sqrt(2.0 / ((fan_in + fan_out) * ksize))
    a = std * math.sqrt(3.0)

    def init(key, shape, dtype=jnp.float32):
        assert shape[0] == kh and shape[1] == kw
        bh = max(kh // sh, 1) if kh % sh == 0 else kh
        bw = max(kw // sw, 1) if kw % sw == 0 else kw
        if kh % sh == 0 and kw % sw == 0 and sh > 1 and sw > 1:
            base = jax.random.uniform(
                key, (bh, bw) + tuple(shape[2:]), dtype, minval=-a, maxval=a
            )
            return jnp.repeat(jnp.repeat(base, sh, axis=0), sw, axis=1)
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


class ConvTranspose2dWN(nn.Module):
    """Weight-normalized 2D transposed conv, NHWC. Matches torch-style
    (kernel_size, stride, padding) output geometry:
    ``out = (in - 1) * stride - 2 * padding + kernel_size``.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 4
    strides: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 1
    gain: float = 1.0
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        kh, kw = _as_pair(self.kernel_size)
        sh, sw = _as_pair(self.strides)
        ph, pw = _as_pair(self.padding)
        in_features = x.shape[-1]

        w = self.param(
            "weight",
            _blockwise_deconv_init(
                self.gain, in_features, self.features, (kh, kw), (sh, sw)
            ),
            (kh, kw, in_features, self.features),
        )
        g = self.param("g", _wn_scale_init(w, self.features))
        w_eff = _wn_effective(w, g, channel_axis=3)

        # Transposed conv as an lhs-dilated conv: dilate the input by the
        # stride and run a stride-1 conv with padding (k - 1 - p).
        y = jax.lax.conv_general_dilated(
            x,
            w_eff.astype(self.dtype or x.dtype),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(self.dtype or x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class Linear(nn.Module):
    """Plain dense layer with the reference's Xavier-uniform init (no WN)."""

    features: int
    gain: float = 1.0
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            xavier_uniform_init(self.gain, in_features, self.features, 1),
            (in_features, self.features),
        )
        y = jnp.dot(x, w.astype(self.dtype or x.dtype))
        y = y.astype(self.dtype or x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class Conv2d(nn.Module):
    """Plain 2D conv (NHWC) with the reference's Xavier-uniform init (no WN)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    gain: float = 1.0
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        kh, kw = _as_pair(self.kernel_size)
        sh, sw = _as_pair(self.strides)
        ph, pw = _as_pair(self.padding)
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            xavier_uniform_init(self.gain, in_features, self.features, kh * kw),
            (kh, kw, in_features, self.features),
        )
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(self.dtype or x.dtype),
            window_strides=(sh, sw),
            padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(self.dtype or x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class ConvSeq(nn.Module):
    """A stack of (conv, leaky-relu) pairs mirroring the reference's
    ``initseq`` convention: every layer followed by an activation gets the
    leaky-relu gain; the final layer (no activation) gets gain 1.

    specs: sequence of dicts with keys features/kernel_size/strides/padding
    and optional "transpose": True.
    """

    specs: Sequence[dict]
    final_activation: bool = False
    dtype: Optional[Any] = None
    # Non-transposed 4x4/stride-2/pad-1 convs whose input has fewer channels
    # than this run via the exact space-to-depth im2col path (0 = disabled).
    s2d_max_ch: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        n = len(self.specs)
        for i, spec in enumerate(self.specs):
            is_last = i == n - 1
            act = (not is_last) or self.final_activation
            gain = LEAKY_GAIN if act else 1.0
            cls = ConvTranspose2dWN if spec.get("transpose") else Conv2dWN
            kwargs = {k: v for k, v in spec.items() if k != "transpose"}
            if (
                not spec.get("transpose")
                and x.shape[-1] < self.s2d_max_ch
                and _as_pair(kwargs.get("kernel_size", 1)) == (4, 4)
                and _as_pair(kwargs.get("strides", 1)) == (2, 2)
                and _as_pair(kwargs.get("padding", 0)) == (1, 1)
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
            ):
                kwargs["s2d"] = True
            x = cls(gain=gain, dtype=self.dtype, **kwargs)(x)
            if act:
                x = leaky_relu(x)
        return x
