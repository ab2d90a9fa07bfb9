"""Test configuration.

Runs the whole suite on a virtual 8-device CPU mesh so multi-chip sharding
paths (pjit over a Mesh) compile and execute without TPU hardware.  Must set
the env vars before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This image's sitecustomize imports jax before conftest runs, so the env
# vars alone are too late; force the config directly (safe as long as no
# backend has been initialized yet).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_ROOT = pathlib.Path(
    os.environ.get("DMV_REFERENCE_ROOT", "/root/reference")
)
FIXTURES = REPO_ROOT / "fixtures"


def reference_available() -> bool:
    return REFERENCE_ROOT.is_dir()


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference dataset not mounted"
)


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="include the slow tier (the full CI-equivalent suite; "
             "default deselects @pytest.mark.slow to keep the per-commit "
             "loop under ~5 min on this 1-core box — REPRODUCING.md)",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: the default run deselects @pytest.mark.slow (the
    heavyweight compile-bound tests — serving end-to-ends, conv trainers,
    GIF renders, the largest oracle parities), keeping a fast per-commit
    loop; ``--slow`` runs everything (the CI-equivalent tier, required
    before shipping — every slow test still runs there, zero coverage
    loss overall)."""
    if config.getoption("--slow"):
        return
    kept, dropped = [], []
    for it in items:
        (dropped if "slow" in it.keywords else kept).append(it)
    if dropped:
        config.hook.pytest_deselected(items=dropped)
        items[:] = kept


@pytest.fixture(scope="session")
def windows_sce1() -> np.ndarray:
    """(38, 10, 3) [t, x, y] float32 windows for sce1 (fixture copy)."""
    return np.load(FIXTURES / "trajectory_sce1_cond.npy")


@pytest.fixture(scope="session")
def all_windows() -> dict:
    return {
        k: np.load(FIXTURES / f"trajectory_{k}_cond.npy")
        for k in ("sce1", "sce2", "sce3", "sce4")
    }


def straight_rect_sweep(n: int, x0: float = 0.0) -> np.ndarray:
    """(n, 2, 4) axis-aligned 2×1 ego rectangles marching along +x —
    shared synthetic geometry for DNDA sweep tests."""
    rects = np.zeros((n, 2, 4))
    rects[:, 0] = (x0 + np.arange(n)[:, None]) + np.array([1.0, -1.0, -1.0, 1.0])
    rects[:, 1] = np.array([-0.5, -0.5, 0.5, 0.5])
    return rects
