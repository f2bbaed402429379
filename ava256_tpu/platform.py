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
    if not env:
        return
    import jax

    try:
        current = jax.config.jax_platforms
    except AttributeError:
        current = None
    if current != env:
        jax.config.update("jax_platforms", env)
