"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; the sharding strategy is
validated on a virtual CPU mesh exactly as the driver's dryrun does.

Note: this image registers a TPU ("axon") PJRT plugin from sitecustomize at
interpreter startup, so JAX_PLATFORMS in the environment is already consumed;
we must switch platforms through jax.config before any backend initializes.
"""
import os
import re

flags = os.environ.get("XLA_FLAGS", "")
# force EXACTLY 8 virtual devices (override any preset count: mesh tests
# assume an 8-way layout)
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The kernel-probe tests deliberately force failures; without this the
# cross-process probe-verdict cache would persist those poisoned
# verdicts into the user's real cache dir (the cache itself is covered
# by a dedicated test that re-enables it against a tmp path).
os.environ["DASHING_TPU_PROBE_CACHE"] = "0"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped with a fixed seed: each test's data is reproducible
    # regardless of which other tests ran (a shared session stream made
    # every test depend on suite order)
    return np.random.default_rng(0xDA5)
