"""Multi-chip sum-factorized operator: DOF lattice sharded along z.

The scaling path for the structured-grid headline op.  Device d owns an
element slab k in [k0_d, k1_d); its DOF slab is planes [k0_d*p, k1_d*p]
INCLUSIVE — the slab-boundary dof plane is duplicated on both neighbours
(the classic overlapping domain decomposition of a tensor grid).

Apply under ``shard_map``:
  - x/y interpolations are plane-local (no communication);
  - the forward z-contraction reads only local dof planes (the duplicated
    boundary plane covers the shared element support);
  - the transposed z-contraction produces partial sums on the two boundary
    dof planes, which are halo-summed with one ``ppermute`` exchange per
    direction (one (NY, NX) plane each — tens of KB over ICI).

Dot products weight duplicated planes by 1/2 so replicated CG runs
unchanged on the sharded vectors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .assembly import SpaceOps, OperatorData
from .sumfact import SumFactoredOperator, _axis_matrices

HI = jax.lax.Precision.HIGHEST


class ShardedSumFactOperator:
    """Builds on SumFactoredOperator's packing; shards the z axis."""

    def __init__(self, ops: SpaceOps, data: OperatorData, nx, ny, nz,
                 order: int, mesh: Mesh, axis: str = "z",
                 dtype=jnp.float32):
        ndev = mesh.devices.size
        if nz % ndev:
            raise ValueError(f"nz={nz} must divide by n_devices={ndev}")
        self.mesh = mesh
        self.axis = axis
        self.ndev = ndev
        self.p = order
        base = SumFactoredOperator(ops, data, nx, ny, nz, order, dtype)
        self.base = base
        self.NX, self.NY, self.NZ = base.NX, base.NY, base.NZ
        self.ndofs = base.ndofs
        p = order
        self.nz_loc = nz // ndev
        self.nplanes_loc = self.nz_loc * p + 1  # incl. duplicated top plane
        self.Kz_loc = base.Kz // ndev

        # local z-axis matrices: (nz_loc*q1, nz_loc*p+1) — identical blocks
        # on every device (uniform grid)
        Az, DAz = _axis_matrices(self.nz_loc, p, base.q1)
        self.Az_loc = jnp.asarray(Az, dtype)
        self.DAz_loc = jnp.asarray(DAz, dtype)
        self.Ax, self.DAx = base.Ax, base.DAx
        self.Ay, self.DAy = base.Ay, base.DAy

        # duplicated-plane layout: device d holds planes
        # [d*nz_loc*p, (d+1)*nz_loc*p] inclusive -> nplanes_loc planes
        self._shard_spec = NamedSharding(mesh, P(axis))

        # D is QP-lattice (mm, Kz, Ky, Kx): shard along Kz (no duplication)
        self.D = jax.device_put(base.D, NamedSharding(mesh, P(None, axis)))

        self._apply = self._build_apply(dtype)

    # -- vector layout -------------------------------------------------------

    def to_sharded(self, u):
        """Global lattice vector (ndofs,) -> sharded (ndev*nplanes_loc, NY,
        NX) with duplicated slab-boundary planes."""
        u3 = np.asarray(u).reshape(self.NZ, self.NY, self.NX)
        slabs = []
        for d in range(self.ndev):
            k0 = d * self.nz_loc * self.p
            slabs.append(u3[k0:k0 + self.nplanes_loc])
        stacked = np.concatenate(slabs, axis=0)
        return jax.device_put(jnp.asarray(stacked), self._shard_spec)

    def from_sharded(self, us):
        """Inverse of to_sharded (drops duplicated planes)."""
        us = np.asarray(us)
        out = np.zeros((self.NZ, self.NY, self.NX))
        for d in range(self.ndev):
            k0 = d * self.nz_loc * self.p
            sl = us[d * self.nplanes_loc:(d + 1) * self.nplanes_loc]
            out[k0:k0 + self.nplanes_loc] = sl
        return out.reshape(-1)

    def ownership_weights(self):
        """(ndev*nplanes_loc, 1, 1) weights: duplicated planes count 1/2."""
        w = np.ones((self.ndev, self.nplanes_loc))
        for d in range(self.ndev):
            if d > 0:
                w[d, 0] = 0.5
            if d < self.ndev - 1:
                w[d, -1] = 0.5
        w = w.reshape(-1, 1, 1)
        return jax.device_put(jnp.asarray(w), self._shard_spec)

    # -- apply ----------------------------------------------------------------

    def _build_apply(self, dtype):
        Ax, DAx, Ay, DAy = self.Ax, self.DAx, self.Ay, self.DAy
        Az, DAz = self.Az_loc, self.DAz_loc
        m = self.base.m
        compressed = self.base.compressed
        pairs = self.base._pairs if compressed else None
        axis = self.axis
        ndev = self.ndev

        def fwd(u3, Mx, My, Mz):
            t = jnp.einsum("ax,zyx->zya", Mx, u3, precision=HI)
            t = jnp.einsum("by,zya->zba", My, t, precision=HI)
            return jnp.einsum("cz,zba->cba", Mz, t, precision=HI)

        def bwd(w3, Mx, My, Mz):
            t = jnp.einsum("cz,cba->zba", Mz, w3, precision=HI)
            t = jnp.einsum("by,zba->zya", My, t, precision=HI)
            return jnp.einsum("ax,zya->zyx", Mx, t, precision=HI)

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P(axis), P(None, axis)), out_specs=P(axis))
        def apply_fn(u_loc, D_loc):
            u3 = u_loc.astype(dtype)
            V = [
                fwd(u3, Ax, Ay, Az),
                fwd(u3, DAx, Ay, Az),
                fwd(u3, Ax, DAy, Az),
                fwd(u3, Ax, Ay, DAz),
            ]
            if compressed:
                W = [D_loc[0] * V[0]]
                for s in range(1, m):
                    W[0] = W[0] + D_loc[s] * V[s]
                Wg = [None] * (m - 1)
                for k, (r, s) in enumerate(pairs):
                    plane = D_loc[m + k]
                    t = plane * V[s]
                    Wg[r - 1] = t if Wg[r - 1] is None else Wg[r - 1] + t
                    if s != r:
                        t2 = plane * V[r]
                        Wg[s - 1] = t2 if Wg[s - 1] is None \
                            else Wg[s - 1] + t2
                W += Wg
            else:
                W = []
                for r in range(m):
                    acc = None
                    for s in range(m):
                        t = D_loc[r * m + s] * V[s]
                        acc = t if acc is None else acc + t
                    W.append(acc)
            y3 = bwd(W[0], Ax, Ay, Az)
            y3 = y3 + bwd(W[1], DAx, Ay, Az)
            y3 = y3 + bwd(W[2], Ax, DAy, Az)
            y3 = y3 + bwd(W[3], Ax, Ay, DAz)

            # halo-sum the duplicated slab-boundary planes:
            # send my TOP plane partial to the right neighbour's BOTTOM
            # plane slot and vice versa, then add.
            if ndev > 1:
                top = y3[-1]
                bot = y3[0]
                from_left = jax.lax.ppermute(
                    top, axis, [(i, i + 1) for i in range(ndev - 1)])
                from_right = jax.lax.ppermute(
                    bot, axis, [(i + 1, i) for i in range(ndev - 1)])
                idx = jax.lax.axis_index(axis)
                y3 = y3.at[0].add(
                    jnp.where(idx > 0, from_left, jnp.zeros_like(top)))
                y3 = y3.at[-1].add(
                    jnp.where(idx < ndev - 1, from_right,
                              jnp.zeros_like(bot)))
            return y3

        return apply_fn

    def __call__(self, u_sharded):
        return self._apply(u_sharded, self.D)

    def bind(self):
        return self._apply, self.D
