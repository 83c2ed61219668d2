"""Framework-wide JAX configuration.

This JAX build defaults matmul precision to bfloat16 (even on CPU), which
silently corrupts pose-math matmuls (4x4 chains, Rodrigues, projections).
Geometry must be exact f32; network code opts IN to bf16 explicitly by
casting activations/weights, so raising the default costs nothing there.
Imported by every jax-facing module in the package.
"""
import os

import jax

jax.config.update("jax_default_matmul_precision", "float32")

# This build's TPU plugin overrides the standard JAX_PLATFORMS env var
# during backend discovery; restore normal JAX semantics so
# `JAX_PLATFORMS=cpu python examples/...` works (and doesn't hang when
# the TPU tunnel is unreachable). Only applied before backends init.
_platforms = os.environ.get("JAX_PLATFORMS")
if _platforms:
    try:
        jax.config.update("jax_platforms", _platforms)
    except Exception:
        pass

# XLA compilation on this host is very slow (single CPU core); persist
# compiled executables across processes.
_cache_dir = os.environ.get(
    "FP_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/fp_tpu_jax_cache")
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # older jax without these knobs
    pass
