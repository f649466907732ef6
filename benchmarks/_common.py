"""Shared benchmark preamble: repo path + the CLI's exact cache/platform
resolution.

Every benchmark previously copy-pasted a hardcoded ~/.cache/dashing_tpu_xla
preamble that IGNORED the DASHING_TPU_CACHE_DIR override the CLI honors
(cli/main.py), so a user pointing the CLI cache elsewhere paid the
60-160 s tunnel compiles again in every benchmark.  `setup()` resolves the
directory the same way the CLI does (DASHING_TPU_CACHE_DIR > XDG_CACHE_HOME
> ~/.cache, empty string disables) and applies DASHING_TPU_PLATFORM.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup(default_platform: str = ""):
    cache_dir = os.environ.get(
        "DASHING_TPU_CACHE_DIR",
        os.path.join(os.environ.get("XDG_CACHE_HOME",
                                    os.path.join(os.path.expanduser("~"),
                                                 ".cache")),
                     "dashing_tpu_xla"))
    if cache_dir:
        if "DASHING_TPU_CACHE_DIR" in os.environ:
            # an explicit override must WIN over a stray ambient
            # JAX_COMPILATION_CACHE_DIR (the CLI's config.update does)
            os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
        else:
            os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
        try:
            os.makedirs(cache_dir, exist_ok=True)
        except OSError:
            pass
    plat = os.environ.get("DASHING_TPU_PLATFORM", default_platform)
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
