"""Test configuration.

Multi-chip sharding is tested on a virtual 8-device CPU mesh (the driver
separately dry-runs the multichip path); set platform env BEFORE jax import.
"""

import os
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell exports axon (tunneled TPU)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
# The tunneled-TPU plugin site dir hijacks the backend even under
# JAX_PLATFORMS=cpu (and device transfers block under pytest); tests run on
# the virtual CPU mesh, so drop it from both this process and children.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":")
    if p and ".axon_site" not in p)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running subprocess test")


@pytest.fixture(scope="session")
def oracle():
    """Build (once) and expose the reference-SDK oracle binaries.

    Returns a dict of binary paths, or skips oracle-dependent tests when the
    reference tree is unavailable.
    """
    ref = "/root/reference"
    build = os.path.join(REPO, "build")
    if not os.path.isdir(ref):
        pytest.skip("reference SDK not available")
    os.makedirs(build, exist_ok=True)
    bins = {name: os.path.join(build, name)
            for name in ("oracle_lzma", "oracle_driver", "oracle_7z", "oracle_fork")}
    if not all(os.path.exists(p) for p in bins.values()):
        subprocess.run(["make", "-C", REPO, "oracle"], check=True,
                       capture_output=True)
    return bins


@pytest.fixture(scope="session")
def corpus():
    from tests.corpus import make_corpus
    return make_corpus()
