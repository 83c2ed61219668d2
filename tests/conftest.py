"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard JAX way — a forced-CPU
backend with 8 virtual devices — since only one physical TPU chip is
reachable from this host. NOTE: this jax build's axon plugin overrides
the JAX_PLATFORMS env var, so the config must be set in-process before
the backend initializes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
