"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths (parallel/) are exercised on CPU with
``--xla_force_host_platform_device_count=8`` exactly as SURVEY.md section 4
prescribes; the real-TPU path is covered by bench.py / __graft_entry__.py.

Note: this environment's sitecustomize registers an experimental remote-TPU
("axon") PJRT backend and force-sets ``jax_platforms="axon,cpu"`` via
jax.config (so plain JAX_PLATFORMS env vars are overridden). Tests must not
touch the tunneled TPU — set the config back to cpu before any backend
initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on CPU"
