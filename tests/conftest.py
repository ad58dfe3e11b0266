"""Test configuration.

Multi-chip sharding is tested on a virtual 8-device CPU mesh (the driver
separately dry-runs the multichip path); set platform env BEFORE jax import.
"""

import os
import subprocess
import sys

# The tunneled-TPU plugin registers its PJRT backend from a sitecustomize
# on PYTHONPATH at *interpreter startup* — before this conftest runs — so
# scrubbing sys.path here is too late: the suite-level hang of round 2
# (blocked in tcp_recvmsg on the tunnel relay) came from that in-process
# registration.  The only reliable scrub point is a fresh interpreter:
# re-exec pytest once with a cleaned environment (no .axon_site on
# PYTHONPATH, JAX_PLATFORMS=cpu, 8 virtual CPU devices for mesh tests).
# The exec happens in pytest_configure below, NOT at import time: during
# initial conftest loading pytest's fd-level capture has fd 1/2 pointed at
# capture temp files, and an exec there runs the whole suite silently;
# by pytest_configure the global capture is suspended and the real fds
# are back on 1/2.
def _reexec_clean():
    _env = dict(os.environ)
    _env["LZT_TESTS_CLEAN_ENV"] = "1"
    _env["JAX_PLATFORMS"] = "cpu"
    # optimization_level=0: the interpret-mode pallas kernels are huge XLA
    # CPU graphs whose full opt passes cost minutes per shape; the tests
    # run tiny inputs, so compile time — not run time — is the budget
    _env["XLA_FLAGS"] = (_env.get("XLA_FLAGS", "")
                         + " --xla_backend_optimization_level=0"
                         + " --xla_force_host_platform_device_count=8").strip()
    _env["PYTHONPATH"] = ":".join(
        p for p in _env.get("PYTHONPATH", "").split(":")
        if p and ".axon_site" not in p)
    # CI pins the LIGHT kernel tune: the default multilit trace is ~2x
    # the ops and its XLA-CPU interpret-mode compile runs 25+ min even at
    # opt level 0 on tiny shapes.  The multilit path's bit-exactness is
    # pinned by test_pallas_decoder.py::test_multilit_kernel_on_chip
    # (runs whenever a TPU-class platform is reachable) and `make
    # test-tpu`; everything the suite checks here (framing, chunkflow,
    # scheduler, sharding, state carry) is tune-independent logic.
    _env.setdefault("LZT_TUNE", "pprev,stage2,chunkflow")
    # the interpret-mode pallas kernels compile for ~2 min each on CPU;
    # the persistent cache turns reruns into ~seconds
    _env.setdefault("JAX_COMPILATION_CACHE_DIR",
                    os.path.join(os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))), "build", "jax_cache"))
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], _env)


os.environ["JAX_PLATFORMS"] = "cpu"  # belt-and-braces for child imports
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pytest  # noqa: E402


def pytest_configure(config):
    if os.environ.get("LZT_TESTS_CLEAN_ENV") != "1":
        _reexec_clean()
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
