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
        img = jax.lax.conv_general_dilated(
            img, kern_h, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        return jax.lax.conv_general_dilated(
            img, kern_w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
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
