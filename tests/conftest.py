"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard JAX way — a forced-CPU
backend with 8 virtual devices — since only one physical TPU chip is
reachable from this host. The environment variables are set BEFORE jax
can initialize (pytest imports conftest first), and the suite refuses
to run if a platform plugin still won the backend anyway: 200 tests
spending an hour producing misleading TPU-numerics failures is strictly
worse than failing in five seconds with the fix-it command.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must happen before the first `import jax` anywhere in the process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_sessionstart(session):
    backend = jax.default_backend()
    n = jax.device_count()
    if backend != "cpu" or n != 8:
        raise RuntimeError(
            f"Test suite requires the virtual 8-device CPU backend but got "
            f"backend={backend!r} with {n} device(s): a platform plugin "
            f"(e.g. the axon TPU plugin) initialized jax before conftest "
            f"could. Run the suite as:\n"
            f"  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 "
            f"python -m pytest tests/"
        )
