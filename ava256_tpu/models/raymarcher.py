# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Raymarcher front-end: selects a marching backend and normalizes units.

Capability parity with the reference wrapper
(reference: models/raymarchers/mvpraymarcher.py:17-54): step size is
``dt / volradius`` and the output is split into rgb / alpha. Backends:

- "reference": pure-JAX oracle (ops.raymarch_ref) — exact, O(K) per step;
  use for tests and tiny scenes.
- "xla": production compacted marcher (ops.raymarch_xla) — tile culling +
  per-ray sample compaction, work proportional to useful samples.
- "pallas": Pallas TPU kernel (ops.raymarch_pallas) for the sampling loop.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


class Raymarcher:
    def __init__(
        self,
        volradius: float,
        dt: float = 1.0,
        backend: str = "xla",
        fadescale: float = 8.0,
        fadeexp: float = 8.0,
        **options,
    ):
        self.volume_radius = volradius
        self.dt = dt / volradius
        self.backend = backend
        self.fadescale = fadescale
        self.fadeexp = fadeexp
        self.options = options

    def __call__(
        self,
        raypos: jnp.ndarray,
        raydir: jnp.ndarray,
        tminmax: jnp.ndarray,
        decout: Dict[str, jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (rayrgb [N,H,W,3], rayalpha [N,H,W,1], rayrgba [N,H,W,4])."""
        primpos = decout["primpos"]
        primrot = decout["primrot"]
        primscale = decout["primscale"]
        template = decout["template"]
        warp = decout.get("warp")

        if self.backend == "reference":
            from ava256_tpu.ops.raymarch_ref import mvp_raymarch_reference

            rayrgba = mvp_raymarch_reference(
                raypos, raydir, self.dt, tminmax,
                primpos, primrot, primscale, template, warp,
                fadescale=self.fadescale, fadeexp=self.fadeexp,
                max_steps=self.options.get("max_steps", 1024),
            )
        elif self.backend == "xla":
            from ava256_tpu.ops.raymarch_xla import mvp_raymarch_xla

            rayrgba = mvp_raymarch_xla(
                raypos, raydir, self.dt, tminmax,
                primpos, primrot, primscale, template, warp,
                fadescale=self.fadescale, fadeexp=self.fadeexp,
                **self.options,
            )
        elif self.backend == "pallas":
            from ava256_tpu.ops.raymarch_pallas import mvp_raymarch_pallas

            options = dict(self.options)
            mesh = options.pop("mesh", None)
            data_axis = options.pop("data_axis", "data")

            prim_mask = decout.get("prim_mask")
            if prim_mask is None:
                prim_mask = jnp.ones(primpos.shape[:2], jnp.float32)

            def march(rp, rd, tmm, pm, pp, pr, ps, tpl, *wp):
                return mvp_raymarch_pallas(
                    rp, rd, self.dt, tmm, pp, pr, ps, tpl,
                    wp[0] if wp else None,
                    prim_mask=pm,
                    fadescale=self.fadescale, fadeexp=self.fadeexp,
                    **options,
                )

            margs = (
                raypos, raydir, tminmax, prim_mask,
                primpos, primrot, primscale, template,
            ) + (() if warp is None else (warp,))
            n = raypos.shape[0]
            if (
                mesh is not None
                and data_axis in mesh.shape
                and mesh.shape[data_axis] > 1
                and n % mesh.shape[data_axis] == 0
            ):
                # Run the kernels per batch shard: pallas_call has no GSPMD
                # partitioning rule, so without this XLA would all-gather the
                # batch and march it replicated on every device. The warp
                # volume (when present) is batch-sharded like the template.
                from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P

                spec = P(data_axis)
                march = shard_map(
                    march, mesh=mesh, in_specs=(spec,) * len(margs),
                    out_specs=spec, check_rep=False,
                )
            rayrgba = march(*margs)
        else:
            raise ValueError(f"unknown raymarch backend: {self.backend}")

        return rayrgba[..., 0:3], rayrgba[..., 3:4], rayrgba
