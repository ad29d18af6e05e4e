"""Test configuration: run everything on a virtual 8-device CPU mesh.

Pallas kernels auto-select interpret mode off-TPU (the `interpret=True`
sanitizer story, SURVEY.md section 5); shard_map collectives are exercised
on the forced-host-platform device mesh — the standard TPU-less way to test
multi-chip code paths.

Note: the environment's sitecustomize imports jax at interpreter startup
(registering the TPU plugin), so env vars are too late here — the platform
must be forced through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
