"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set platform/flags before the first `import jax` anywhere in the test
process (SURVEY.md §4: simulate pod slices without hardware).
"""
import os

# The harness environment pins JAX_PLATFORMS=axon (real TPU via tunnel) and a
# sitecustomize module force-updates jax.config jax_platforms="axon,cpu" at
# interpreter start, so overriding the env var is not enough — re-update the
# config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# XLA:CPU's compiler segfaults intermittently (observed inside
# backend_compile_and_load on the wide-window tracking program), killing the
# xdist worker and failing an otherwise-green test. Reschedule a crashed
# test once on a restarted worker (requires --max-worker-restart, set in
# pytest.ini); a second crash of the same test fails for real.
_crash_retried = set()


def pytest_handlecrashitem(crashitem, report, sched):
    if crashitem in _crash_retried:
        return
    _crash_retried.add(crashitem)
    try:
        sched.mark_test_pending(crashitem)
    except NotImplementedError:
        # loadscope/loadfile schedulers don't implement mark_test_pending;
        # re-enqueue the item under its scope by hand.
        scope = sched._split_scope(crashitem)
        sched.workqueue.setdefault(scope, {})[crashitem] = False
    report.outcome = "rescheduled"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
