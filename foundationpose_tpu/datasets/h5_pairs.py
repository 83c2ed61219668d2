"""HDF5 training-pair datasets for the refiner and scorer.

Host-side reader for the reference's training data layout
(learning/datasets/h5_dataset.py:20-219): one HDF5 group per object key,
`i_perturb_*` subgroups holding encoded rgbA/rgbB/depthA/depthB images
plus poseA/poseB, crop_ratio, H_ori/W_ori, trans_normalizer and
rot_normalizer. Yields NHWC 6-channel (rgb + centered xyz) net inputs —
the same tensors the inference crop builder produces.
"""
from __future__ import annotations

import io
import logging

import numpy as np

logger = logging.getLogger(__name__)


def _decode_image(raw) -> np.ndarray:
    import imageio.v2 as imageio

    if isinstance(raw, np.ndarray) and raw.ndim >= 2:
        return np.asarray(raw)
    return np.asarray(imageio.imread(io.BytesIO(bytes(raw))))


class PairH5Dataset:
    """Refiner training pairs (PoseRefinePairH5Dataset train mode)."""

    def __init__(self, h5_file: str, max_num_key: int | None = None):
        import h5py

        self.h5_file = h5_file
        with h5py.File(h5_file, "r") as hf:
            self.object_keys = list(hf.keys())
            if max_num_key is not None:
                self.object_keys = self.object_keys[:max_num_key]
            group = hf[self.object_keys[0]]
            self.perturb_keys = [k for k in group if "i_perturb" in k]
            g0 = group[self.perturb_keys[0]]
            self.crop_ratio = float(g0["crop_ratio"][()]) if "crop_ratio" in g0 else 1.2
            self.H_ori = int(g0["H_ori"][()]) if "H_ori" in g0 else 540
            self.W_ori = int(g0["W_ori"][()]) if "W_ori" in g0 else 720
            self.trans_normalizer = (
                np.asarray(g0["trans_normalizer"][()]).reshape(-1).tolist()
                if "trans_normalizer" in g0
                else [0.02, 0.02, 0.05]
            )
            self.rot_normalizer = (
                float(g0["rot_normalizer"][()]) / 180.0 * np.pi
                if "rot_normalizer" in g0
                else 0.34906585
            )

    def __len__(self):
        return len(self.object_keys)

    def load_pair(self, key_idx: int, perturb_idx: int):
        """-> dict with rgbA/rgbB (H,W,3) u8, depthA/depthB (H,W) f32 m,
        poseA/poseB (4,4), K (3,3), mesh_diameter."""
        import h5py

        with h5py.File(self.h5_file, "r") as hf:
            g = hf[self.object_keys[key_idx]][self.perturb_keys[perturb_idx]]
            out = {
                "rgbA": _decode_image(g["rgbA"][()])[..., :3],
                "rgbB": _decode_image(g["rgbB"][()])[..., :3],
                "depthA": _decode_image(g["depthA"][()]).astype(np.float32) / 1e3,
                "depthB": _decode_image(g["depthB"][()]).astype(np.float32) / 1e3,
                "poseA": np.asarray(g["poseA"][()]).reshape(4, 4),
                "K": np.asarray(g["K"][()]).reshape(3, 3),
            }
            for k in ("poseB", "mesh_diameter", "tf_to_crop"):
                if k in g:
                    out[k] = np.asarray(g[k][()])
        return out
