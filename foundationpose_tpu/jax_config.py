"""Framework-wide JAX configuration.

This JAX build defaults matmul precision to bfloat16 (even on CPU), which
silently corrupts pose-math matmuls (4x4 chains, Rodrigues, projections).
Geometry must be exact f32; network code opts IN to bf16 explicitly by
casting activations/weights, so raising the default costs nothing there.
Imported by every jax-facing module in the package.
"""
import jax

jax.config.update("jax_default_matmul_precision", "float32")
