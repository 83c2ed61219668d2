"""foundationpose_tpu: a TPU-native 6-DoF object pose estimation framework.

A from-scratch JAX/XLA/Pallas redesign with the capabilities of
NVlabs/FoundationPose (CVPR 2024): model-based and model-free novel-object
pose estimation and tracking. The compute path is pure JAX compiled by XLA
for TPU (Pallas kernels for the rasterizer and hash-grid encoder); the
runtime around it (pose clustering, mesh I/O, dataset readers) is
host-side numpy/C++.
"""

__version__ = "0.1.0"

from .meshio import TriMesh, load_mesh  # noqa: F401


def __getattr__(name):
    # Lazy to keep `import foundationpose_tpu` light (no jax import) for
    # host-only tooling like dataset readers and mesh conversion.
    if name == "FoundationPose":
        from .pipeline.estimator import FoundationPose

        return FoundationPose
    if name == "MultiTracker":
        from .pipeline.multi import MultiTracker

        return MultiTracker
    raise AttributeError(name)
