"""Platform selection helper.

Some container images pre-import jax in a sitecustomize (registering a
TPU tunnel backend), which makes the usual JAX_PLATFORMS env var
ineffective for scripts. ``select_platform()`` applies the choice via
jax.config AFTER import, which always works:

    SCLMD_PLATFORM=cpu python examples/runmd.py
"""

from __future__ import annotations

import os


def select_platform(default: str | None = None) -> str:
    """Apply SCLMD_PLATFORM (or ``default``) via jax.config; returns the
    resulting platform name."""
    import jax

    want = os.environ.get("SCLMD_PLATFORM", default)
    if want:
        jax.config.update("jax_platforms", want)
    return jax.devices()[0].platform
