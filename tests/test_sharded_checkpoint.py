"""Orbax-backed sharded checkpoints (the per-rank restart-file analog)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmfem_tpu.io import save_sharded, load_sharded


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_checkpoint_roundtrip_and_world_size(tmp_path):
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("z",))
    sh = NamedSharding(mesh, P("z"))
    rng = np.random.default_rng(0)
    u = jax.device_put(jnp.asarray(rng.standard_normal((64, 33))), sh)
    X = jax.device_put(jnp.asarray(rng.standard_normal((16, 9, 3))),
                       NamedSharding(mesh, P("z", None, None)))
    path = str(tmp_path / "ck")
    save_sharded(path, 12, 3.5, {"u": u, "X": X})
    step, t, out = load_sharded(path, {"u": sh})
    assert step == 12 and t == 3.5
    assert bool(jnp.all(out["u"] == u)) and bool(jnp.all(out["X"] == X))
    assert out["u"].sharding == sh  # restored onto the requested layout

    # world-size rule: reject a checkpoint from a different device count
    meta = json.load(open(tmp_path / "ck" / "meta.json"))
    meta["n_devices"] = 4
    json.dump(meta, open(tmp_path / "ck" / "meta.json", "w"))
    with pytest.raises(ValueError, match="world size"):
        load_sharded(path)
    # and bad magic
    meta["n_devices"] = 8
    meta["magic"] = "nope"
    json.dump(meta, open(tmp_path / "ck" / "meta.json", "w"))
    with pytest.raises(ValueError, match="magic"):
        load_sharded(path)
