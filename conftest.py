"""Repo-root conftest: make src/ importable and force the CPU backend with a
virtual 8-device mesh for all tests (SURVEY.md §5.4 — distributed tests
without a cluster). bench.py / __graft_entry__.py do NOT import this and run
on the real TPU."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))

# Must be set before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
