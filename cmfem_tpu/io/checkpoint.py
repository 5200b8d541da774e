"""Sharded checkpoint/restore via orbax.

The multi-chip analog of the reference's per-rank binary restart files
(RestartPathForRank + world-size enforcement,
ablation_test_case2_1_2D.cpp:982-998, :2733-2738): arrays are saved with
their ``jax.sharding`` layout and restored shard-by-shard onto a target
``Mesh`` — each device writes/reads only its own shards, and a mesh-shape
mismatch is rejected up front (the world-size check equivalent) before
orbax touches any device buffers.

The npz checkpoints in the ablation drivers stay the single-host format;
this is the scale-out path for element- or lattice-sharded state.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

_META = "meta.json"
_STATE = "state"
_MAGIC = "cmfem-sharded-ckpt"
_VERSION = 1


def save_sharded(path: str, step: int, time: float, arrays: dict) -> None:
    """Save a dict of (possibly sharded) jax arrays plus (step, time)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, _STATE), dict(arrays), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, _META), "w") as f:
        json.dump({"magic": _MAGIC, "version": _VERSION,
                   "step": int(step), "time": float(time),
                   "n_devices": len(jax.devices()),
                   "names": sorted(arrays)}, f)


def load_sharded(path: str, shardings: dict | None = None):
    """Restore arrays, placing any named in ``shardings``
    ({name: jax.sharding.Sharding}) onto that layout.  Returns
    (step, time, arrays).  Raises ValueError on magic/version/world-size
    mismatch before any array data is read."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    if meta.get("magic") != _MAGIC:
        raise ValueError(f"Invalid sharded checkpoint magic in: {path}")
    if meta.get("version") != _VERSION:
        raise ValueError(
            f"Unsupported sharded checkpoint version in: {path}")
    if meta["n_devices"] != len(jax.devices()):
        raise ValueError(
            f"Sharded checkpoint world size mismatch for {path} "
            f"(file={meta['n_devices']}, run={len(jax.devices())}).")
    ckptr = ocp.StandardCheckpointer()
    full = ckptr.restore(os.path.join(path, _STATE))
    arrays = {}
    for name, arr in full.items():
        if shardings and name in shardings:
            # device_put the host array straight into its target layout;
            # a jnp.asarray first would commit the FULL array to the
            # default device (OOM for arrays that only fit sharded)
            arrays[name] = jax.device_put(np.asarray(arr),
                                          shardings[name])
        else:
            arrays[name] = jnp.asarray(arr)
    return meta["step"], meta["time"], arrays
