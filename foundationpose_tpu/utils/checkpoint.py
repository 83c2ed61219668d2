"""Checkpointing: orbax for training state, npz for inference params.

The reference saves write-only torch checkpoints for NeRF training
(nerf_runner.py:393-421) with no resume path; here both save AND resume
are first-class. Estimator network params (converted or trained) use a
flat npz so they load with zero deps.
"""
from __future__ import annotations

import os

import numpy as np


def _flatten(tree, prefix=""):
    # List indices flatten as '#i' so they stay distinguishable from
    # dicts with digit-string keys (the network param trees use "0","1"
    # sub-block names, which must NOT come back as lists).
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}#{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val

    def listify(d):
        if isinstance(d, dict):
            keys = list(d.keys())
            if keys and all(k.startswith("#") and k[1:].isdigit() for k in keys):
                return [listify(d[f"#{i}"]) for i in range(len(keys))]
            # pre-'#' archives flattened list indices as bare digits;
            # only treat those as lists when ALL keys are digits AND the
            # archive has no '#' markers anywhere (legacy format)
            return {k: listify(v) for k, v in d.items()}
        return d

    return listify(root)


_META_KEY = "__meta_json__"


def save_params(path: str, params, meta: dict | None = None) -> None:
    """Save a (possibly nested dict/list) param pytree to one .npz.

    `meta` (JSON-serializable) rides along under a reserved key — used
    by cli.convert_weights to embed the checkpoint's reference config so
    weights can never be loaded under the wrong pipeline config."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(params)
    if meta is not None:
        import json

        flat[_META_KEY] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        )
    np.savez_compressed(path, **flat)


def load_params(path: str):
    return load_params_meta(path)[0]


def load_params_meta(path: str):
    """Returns (params, meta_dict_or_None)."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    meta = None
    if _META_KEY in flat:
        import json

        meta = json.loads(flat.pop(_META_KEY).tobytes().decode("utf-8"))
    return _unflatten(flat), meta


def save_train_state(ckpt_dir: str, step: int, state) -> None:
    """Orbax checkpoint of arbitrary train state (params + opt state)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, f"step_{step:07d}"), state, force=True)


def latest_step(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def load_train_state(ckpt_dir: str, step: int | None = None, template=None):
    """Restore train state; step=None loads the latest."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:07d}")
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            restored = ckptr.restore(path, item=template)
        else:
            restored = ckptr.restore(path)
    return step, restored
