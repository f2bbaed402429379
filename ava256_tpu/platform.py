# Copyright (c) ava256_tpu contributors.
# All rights reserved.
#
# This source code is licensed under the license found in the
# LICENSE file in the root directory of this source tree.
"""Platform selection guard.

Some TPU plugins (e.g. the axon PJRT plugin registered via sitecustomize)
force jax_platforms through jax.config at interpreter start, which silently
overrides the JAX_PLATFORMS environment variable. CLIs call
``respect_env_platforms()`` before touching devices so a user-requested
platform (JAX_PLATFORMS=cpu ...) actually wins.
"""

from __future__ import annotations

import os


def respect_env_platforms() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    enable_compilation_cache()
    if not env:
        return
    import jax

    try:
        current = jax.config.jax_platforms
    except AttributeError:
        current = None
    if current != env:
        jax.config.update("jax_platforms", env)


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables across processes. TPU compiles of the
    fused train step are expensive (remote compilation in some environments);
    the cache makes every run after the first start instantly."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "ava256_tpu", "jax_cache"
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — cache flags vary across jax versions
        pass
