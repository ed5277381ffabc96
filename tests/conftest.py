"""Test configuration: force CPU + a virtual 8-device mesh before any test runs.

Unit tests need exact fp32 (the TPU would run matmuls through bf16 MXU passes)
and the virtual 8-device mesh for multi-chip sharding tests only exists on the
host platform. The environment may pin JAX_PLATFORMS to the TPU tunnel
platform, and that plugin ignores the env var — so we override through
jax.config, which wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end test (runs in the default "
        "suite; deselect with -m 'not slow' for a quick pass)")
    config.addinivalue_line(
        "markers", "golden: executes the PyTorch reference as a test oracle "
        "(auto-applied to every test in a module importing torch or "
        "reference_oracle). Smoke tier: -m 'not golden and not slow'")


# modules that import torch / reference_oracle execute the reference as an
# oracle — expensive on a contended CPU. Auto-marking keeps the tier list in
# one place instead of 14 files (VERDICT r3 item 9).
import pathlib as _pathlib

_GOLDEN_MODULES = frozenset(
    p.stem for p in (_pathlib.Path(__file__).parent).glob("test_*.py")
    if ("reference_oracle" in p.read_text()
        or "import torch" in p.read_text()
        or "from torch" in p.read_text())
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in _GOLDEN_MODULES:
            item.add_marker(pytest.mark.golden)
