# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Image quality metrics (PSNR / SSIM) for evaluation and parity tracking.

The reference publishes no fidelity numbers (BASELINE.md); parity is
self-measured. These metrics quantify reconstruction quality during training
and for cross-stack comparisons (BASELINE.json's "PSNR/LPIPS parity" metric
definition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over the whole batch."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 255.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over a batch of NHWC images (Gaussian-windowed)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)

    half = kernel_size // 2
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    c = x.shape[-1]
    kern_h = jnp.tile(g.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kern_w = jnp.tile(g.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))

    def blur(img):
        # the variance terms cancel catastrophically (blur(x^2) - mu^2 with
        # x ~ O(100)); the platform's default low matmul precision (bf16 on
        # TPU) makes them garbage relative to c2 — force full precision
        img = jax.lax.conv_general_dilated(
            img, kern_h, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jax.lax.conv_general_dilated(
            img, kern_w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    mu_x = blur(x)
    mu_y = blur(y)
    mu_x2, mu_y2, mu_xy = mu_x**2, mu_y**2, mu_x * mu_y
    sig_x = blur(x * x) - mu_x2
    sig_y = blur(y * y) - mu_y2
    sig_xy = blur(x * y) - mu_xy

    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    return jnp.mean(num / den)


# ---------------------------------------------------------------------------
# LPIPS (learned perceptual image patch similarity)
# ---------------------------------------------------------------------------

_LPIPS_LAYERS = (  # AlexNet-topology feature stack: (out_ch, kernel, stride)
    (64, 11, 4),
    (192, 5, 1),
    (384, 3, 1),
    (256, 3, 1),
    (256, 3, 1),
)


def _lpips_filters(seed: int = 0):
    """Deterministic He-initialized filters for the fallback metric."""
    import numpy as np

    rng = np.random.RandomState(seed)
    filters = []
    cin = 3
    for cout, k, _ in _LPIPS_LAYERS:
        w = rng.randn(k, k, cin, cout).astype(np.float32)
        w *= np.sqrt(2.0 / (k * k * cin))
        filters.append(w)
        cin = cout
    return filters


def lpips_weights_path(weights_path: str | None = None) -> str | None:
    """Resolve the trained-LPIPS weights file (.npz) if one is configured and
    exists: the explicit argument wins, else the AVA256_LPIPS_WEIGHTS env
    var. Returns None when the metric would fall back to random features —
    callers MUST then report the value under the key ``lpips_rf``, never
    ``lpips`` (random-feature distances are orders of magnitude smaller than
    trained-AlexNet LPIPS and must not be compared against them). Produce the
    .npz from the reference pip package with scripts/lpips_export.py."""
    import os

    weights_path = weights_path or os.environ.get("AVA256_LPIPS_WEIGHTS")
    if weights_path and os.path.exists(weights_path):
        return weights_path
    return None


def lpips(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 255.0,
    weights_path: str | None = None,
    seed: int = 0,
) -> jnp.ndarray:
    """LPIPS distance over a batch of NHWC images (lower is better).

    Uses the standard recipe (Zhang et al. 2018): a conv feature stack,
    channel-unit-normalized features per layer, squared differences averaged
    spatially and summed over layers. If ``weights_path`` (or the
    AVA256_LPIPS_WEIGHTS env var) points to an .npz with arrays
    ``conv0..conv4`` [k,k,cin,cout] and optional ``lin0..lin4`` [cout] linear
    calibration weights, those trained filters are used; otherwise the metric
    falls back to deterministic He-initialized random features — random-filter
    perceptual distances track trained LPIPS closely in ranking terms
    (Amir & Weiss, "Understanding and Simplifying Perceptual Distances",
    CVPR 2021) and keep the metric self-contained in a no-download
    environment. The fallback is deterministic (fixed seed), so values are
    comparable across runs of this codebase, but not against other stacks'
    LPIPS numbers.
    """
    import numpy as np

    weights_path = lpips_weights_path(weights_path)
    lins = [None] * len(_LPIPS_LAYERS)
    if weights_path:
        data = np.load(weights_path)
        filters = [np.asarray(data[f"conv{i}"], np.float32) for i in range(5)]
        lins = [
            np.asarray(data[f"lin{i}"], np.float32) if f"lin{i}" in data else None
            for i in range(5)
        ]
    else:
        filters = _lpips_filters(seed)

    # scale to [-1, 1] like the reference implementation's input convention
    x = pred.astype(jnp.float32) / data_range * 2.0 - 1.0
    y = target.astype(jnp.float32) / data_range * 2.0 - 1.0

    def features(img):
        feats = []
        h = img
        for w, (cout, k, stride) in zip(filters, _LPIPS_LAYERS):
            h = jax.lax.conv_general_dilated(
                h, jnp.asarray(w), (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.relu(h)
            feats.append(h)
            if len(feats) in (1, 2):  # pool between early stages
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
                )
        return feats

    fx = features(x)
    fy = features(y)
    total = jnp.zeros(())
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        d = (a - b) ** 2
        if lins[i] is not None:
            d = d * jnp.asarray(lins[i])[None, None, None, :]
            total = total + jnp.mean(jnp.sum(d, axis=-1))
        else:
            # uncalibrated variant: uniform channel average per layer
            total = total + jnp.mean(d)
    return total
