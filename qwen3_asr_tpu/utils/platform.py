"""Platform selection helper.

Some environments pre-import jax with a pinned platform (overriding the
JAX_PLATFORMS env var). Serving entrypoints call this to re-assert the
operator's intent so e.g. CPU smoke deployments and subprocess workers run
where they were told to.
"""
from __future__ import annotations

import os


def honor_platform_env() -> None:
    plat = os.getenv("JAX_PLATFORMS")
    if not plat:
        return
    import jax
    try:
        if str(jax.config.jax_platforms or "") != plat:
            jax.config.update("jax_platforms", plat)
    except RuntimeError:
        pass  # backend already initialized
