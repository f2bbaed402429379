# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Full volumetric autoencoder: image -> codes -> MVP volume -> image.

Capability parity with the reference top-level module
(reference: models/autoencoder.py:23-284), NHWC layouts:

forward = identity-encode (or cached id_cond) -> expression-encode ->
VAE bottleneck -> decode (assemble primitives -> raymarch -> color
calibration -> background matting).
"""

from __future__ import annotations

from typing import Any, Dict, FrozenSet, Optional

import jax.numpy as jnp
from flax import linen as nn

from ava256_tpu.models.bg import BackgroundModelSimple
from ava256_tpu.models.bottleneck import VAEBottleneck
from ava256_tpu.models.colorcal import Colorcal
from ava256_tpu.models.decoders.assembler import DecoderAssembler
from ava256_tpu.models.encoders.expression import ExpressionEncoder
from ava256_tpu.models.encoders.identity import IdentityEncoder
from ava256_tpu.models.raymarcher import Raymarcher
from ava256_tpu.ops.raydirs import compute_raydirs


class Autoencoder(nn.Module):
    identity_encoder: IdentityEncoder
    expression_encoder: ExpressionEncoder
    bottleneck: VAEBottleneck
    decoder_assembler: DecoderAssembler
    raymarcher: Raymarcher  # plain callable, holds no params
    colorcal: Optional[Colorcal] = None
    bgmodel: Optional[BackgroundModelSimple] = None

    def __call__(
        self,
        # Camera parameters
        camrot: jnp.ndarray,  # [B, 3, 3]
        campos: jnp.ndarray,  # [B, 3]
        focal: jnp.ndarray,  # [B, 2]
        princpt: jnp.ndarray,  # [B, 2]
        modelmatrix: jnp.ndarray,  # [B, 4, 4] (or [B, 3, 4])
        # Encoder inputs (NHWC textures, [B, V, 3] vertices)
        avgtex: jnp.ndarray,
        verts: jnp.ndarray,
        neut_avgtex: jnp.ndarray,
        neut_verts: jnp.ndarray,
        target_neut_avgtex: Optional[jnp.ndarray],
        target_neut_verts: Optional[jnp.ndarray],
        # Pixels to raymarch
        pixelcoords: jnp.ndarray,  # [B, H, W, 2]
        # Indexing for background/color modeling
        idindex: Optional[jnp.ndarray] = None,
        camindex: Optional[jnp.ndarray] = None,
        id_cond: Optional[Dict[str, Any]] = None,
        bg: Optional[jnp.ndarray] = None,
        running_avg_scale: bool = False,
        gt_geo: Optional[jnp.ndarray] = None,
        residuals_weight: float = 1.0,
        output_set: FrozenSet[str] = frozenset(),
        force_neutral: bool = False,
        alpha_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
        render: bool = True,
    ) -> Dict[str, Optional[jnp.ndarray]]:
        if neut_verts is None or neut_avgtex is None:
            raise ValueError("Empty identity conditioning data")

        if id_cond is None:
            assert target_neut_avgtex is not None and target_neut_verts is not None
            id_cond = self.identity_encoder(target_neut_verts, target_neut_avgtex)

        expr_code = self.expression_encoder(
            verts=verts, avgtex=avgtex, neut_verts=neut_verts, neut_avgtex=neut_avgtex
        )
        if force_neutral:
            expr_code = jnp.zeros_like(expr_code)

        expr_code, expr_mu, expr_logstd = self.bottleneck(
            expr_code, deterministic=deterministic
        )

        result: Dict[str, Optional[jnp.ndarray]] = {
            "encoding": expr_code,
            "expr_mu": expr_mu,
            "expr_logstd": expr_logstd,
            "id_cond": id_cond if "idcond" in output_set else None,
        }

        result.update(
            self.decode(
                camrot=camrot,
                campos=campos,
                focal=focal,
                princpt=princpt,
                modelmatrix=modelmatrix,
                id_cond=id_cond,
                expr_encoding=expr_code,
                pixelcoords=pixelcoords,
                idindex=idindex,
                camindex=camindex,
                bg=bg,
                running_avg_scale=running_avg_scale,
                gt_geo=gt_geo,
                residuals_weight=residuals_weight,
                output_set=output_set,
                alpha_mask=alpha_mask,
                render=render,
            )
        )
        return result

    def decode(
        self,
        camrot: jnp.ndarray,
        campos: jnp.ndarray,
        focal: jnp.ndarray,
        princpt: jnp.ndarray,
        modelmatrix: jnp.ndarray,
        id_cond: Dict[str, Any],
        expr_encoding: jnp.ndarray,
        pixelcoords: jnp.ndarray,
        idindex: Optional[jnp.ndarray] = None,
        camindex: Optional[jnp.ndarray] = None,
        bg: Optional[jnp.ndarray] = None,
        running_avg_scale: bool = False,
        gt_geo: Optional[jnp.ndarray] = None,
        residuals_weight: float = 1.0,
        output_set: FrozenSet[str] = frozenset(),
        alpha_mask: Optional[jnp.ndarray] = None,
        render: bool = True,
    ) -> Dict[str, Optional[jnp.ndarray]]:
        # Model-relative viewing position: (campos - t) @ R
        viewpos = jnp.einsum(
            "ni,nij->nj", campos - modelmatrix[:, :3, 3], modelmatrix[:, :3, :3]
        )

        decout = self.decoder_assembler(
            id_cond,
            expr_encoding,
            viewpos,
            running_avg_scale=running_avg_scale,
            gt_geo=gt_geo,
            residuals_weight=residuals_weight,
        )

        if alpha_mask is not None:
            # jit-friendly variant of the reference's primitive culling: a
            # [U, V] UV-space mask resampled to the primitive grid multiplies
            # template alpha (identical image; static shapes preserved).
            nh = self.decoder_assembler.nh
            from ava256_tpu.ops.grid_sample import resize_bilinear

            m = resize_bilinear(alpha_mask[None, :, :, None], (nh, nh))
            m = (m.reshape(1, nh * nh, 1, 1, 1, 1) > 0.5).astype(decout["template"].dtype)
            decout["template"] = decout["template"].at[..., 3:4].mul(m)
            # physical culling: the pallas backend drops masked prims at the
            # tile-culling stage, recovering the reference's speed benefit
            # (reference: models/autoencoder.py:214-228)
            decout["prim_mask"] = jnp.broadcast_to(
                m.reshape(1, nh * nh), (decout["template"].shape[0], nh * nh)
            )

        # Normalized screen coordinates of the traced pixels
        samplecoords = jnp.concatenate(
            [
                pixelcoords[..., :1] * 2.0 / (pixelcoords.shape[-2] - 1) - 1.0,
                pixelcoords[..., 1:] * 2.0 / (pixelcoords.shape[-3] - 1) - 1.0,
            ],
            axis=-1,
        )

        if not render:
            # Decode-only mode (static branch): everything up to — but not
            # including — the raymarch, so profilers can attribute the
            # forward as march vs model without a kernel-level trace.
            return {
                "irgbrec": None,
                "verts": decout["verts"],
                "template": decout["template"],
                "primscale": decout["primscale"] if "primscale" in output_set else None,
                "samplecoords": samplecoords if "samplecoords" in output_set else None,
            }

        raypos, raydir, tminmax = compute_raydirs(
            campos, camrot, focal, princpt, pixelcoords, self.raymarcher.volume_radius
        )

        rayrgb, rayalpha, _ = self.raymarcher(raypos, raydir, tminmax, decout)

        if self.colorcal is not None and camindex is not None and idindex is not None:
            rayrgb = self.colorcal(rayrgb, camindex, idindex)

        if bg is None and (
            self.bgmodel is not None and camindex is not None and idindex is not None
        ):
            bg = self.bgmodel(camindex, idindex, samplecoords)

        if bg is not None:
            rayrgb = rayrgb + (1.0 - rayalpha) * bg
        # else: implicit black background

        return {
            "irgbrec": rayrgb,
            "verts": decout["verts"],
            "primscale": decout["primscale"] if "primscale" in output_set else None,
            "samplecoords": samplecoords if "samplecoords" in output_set else None,
            "bg": bg if "bg" in output_set else None,
            "ialpha": rayalpha if "ialpha" in output_set else None,
            # Exact kernel operands of the march this forward performed, so
            # benchmarks can time the raymarch on the very scene the step
            # renders (not a synthetic stand-in).
            "march_inputs": (
                {
                    "raypos": raypos,
                    "raydir": raydir,
                    "tminmax": tminmax,
                    "stepsize": self.raymarcher.dt,
                    "primpos": decout["primpos"],
                    "primrot": decout["primrot"],
                    "primscale": decout["primscale"],
                    "template": decout["template"],
                    "warp": decout.get("warp"),
                }
                if "march_inputs" in output_set
                else None
            ),
        }
