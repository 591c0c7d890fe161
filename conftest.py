"""Repo-root conftest: make src/ importable and force the CPU backend with a
virtual 8-device mesh for all tests (SURVEY.md §5.4 — distributed tests
without a cluster). bench.py / __graft_entry__.py do NOT import this and run
on the real TPU.

Note: this sandbox's sitecustomize imports jax at interpreter startup and
registers the axon TPU plugin with jax_platforms=axon,cpu — setting the
JAX_PLATFORMS env var here is therefore too late. The backend itself is
still uninitialized at conftest time, so jax.config.update works.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already in sys.modules via sitecustomize)

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend, got " + repr(jax.devices()[:1]))
assert len(jax.devices()) == 8, "expected 8 forced host devices"
