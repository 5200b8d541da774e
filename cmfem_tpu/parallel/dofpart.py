"""DOF-partitioned distributed operator: per-device memory ∝ 1/N.

The replicated-vector scheme in ``parallel.sharding`` keeps the whole DOF
vector on every device — fine for the reference suite's sizes, but memory
per device does not scale down with the device count.  This module is the
unstructured analog of the reference's ``ParFiniteElementSpace`` true-dof
machinery (linear_convection_diffusion_2D.cpp:312-322, SURVEY.md §2.4):

- elements are grouped by an RCB partition (``parallel.partition``);
- every DOF is *owned* by the lowest-numbered part that touches it; each
  device stores only its owned slab plus ghost copies of the partition-
  interface DOFs its elements touch;
- an operator apply is

    publish owned interface values -> ONE psum over an interface-length
    vector (each slot written by exactly one owner, so the sum is a
    broadcast) -> gather ghosts -> element-local B^T D B kernel ->
    local segment-sum -> scatter ghost contributions back through a
    second interface psum -> add to owners

  i.e. two interface-sized collectives per apply; the interface is a
  surface term (≪ the owned volume), so both memory and collective
  payload scale.
- dot products / norms reduce over the owned slabs only (padding slots
  stay identically zero), so the jittable CG from ``solvers.krylov`` runs
  unchanged on the distributed vectors under GSPMD.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .partition import partition_elements
from .sharding import qp_block_apply


class DofPartition:
    """Element/DOF ownership machinery shared by every dof-partitioned
    kernel (the CDR operator below and the ablation Newton step in
    ``parallel.ablation_dofpart``): RCB element parts, lowest-part DOF
    ownership, per-device [owned | ghost] local index spaces, and the
    interface publish/gather maps that make a halo exchange ONE psum over
    an interface-length vector."""

    def __init__(self, eldofs, nglobal, ndev, parts=None, mesh=None):
        ed = np.asarray(eldofs, dtype=np.int64)
        ne, nd = ed.shape
        self.nglobal = int(nglobal)
        self.ndev = int(ndev)
        self.nd = nd
        if parts is None:
            parts = partition_elements(mesh, ndev)
        parts = np.asarray(parts, dtype=np.int64)
        if len(parts) != ne:
            raise ValueError(f"parts has {len(parts)} entries for {ne} "
                             "elements")
        if parts.min() < 0 or parts.max() >= ndev:
            # out-of-range parts would be silently dropped by the packing
            # loops below -> wrong matvec with no error
            raise ValueError(f"parts ids must lie in [0, {ndev}); got "
                             f"[{parts.min()}, {parts.max()}]")
        self.parts = parts

        # -- ownership: lowest part touching each dof ----------------------
        owner = np.full(nglobal, ndev, dtype=np.int64)
        for d in range(ndev):
            dofs_d = np.unique(ed[parts == d])
            owner[dofs_d] = np.minimum(owner[dofs_d], d)
        assert owner.max() < ndev, "dof untouched by any element"
        self.owner = owner

        # interface dofs: touched by >= 2 parts (global slot numbering)
        touch = np.zeros((nglobal,), dtype=np.int64)
        touched_by = [np.unique(ed[parts == d]) for d in range(ndev)]
        for dofs_d in touched_by:
            touch[dofs_d] += 1
        iface_global = np.nonzero(touch >= 2)[0]
        nif = len(iface_global)
        self.n_interface = nif
        if2slot = np.full(nglobal, -1, dtype=np.int64)
        if2slot[iface_global] = np.arange(nif)

        # -- per-device owned / ghost layouts ------------------------------
        owned = [np.nonzero(owner == d)[0] for d in range(ndev)]
        nown_max = max(1, max(len(o) for o in owned))
        self.nown_max = nown_max
        self.nown = np.array([len(o) for o in owned])
        g2loc = np.full(nglobal, -1, dtype=np.int64)
        for d in range(ndev):
            g2loc[owned[d]] = np.arange(len(owned[d]))
        self.owned = owned

        ghosts = []
        for d in range(ndev):
            gd = touched_by[d][owner[touched_by[d]] != d]
            ghosts.append(gd)
        nghost_max = max(1, max(len(g) for g in ghosts))
        self.nghost_max = nghost_max
        self.ghosts = ghosts
        self.n_loc = nown_max + nghost_max

        # per-device global dof -> local [owned | ghost] slot (-1 = absent)
        ne_max = max(1, int(np.bincount(parts, minlength=ndev).max()))
        self.ne_max = ne_max
        self.elem_idx = [np.nonzero(parts == d)[0] for d in range(ndev)]
        self.loc_maps = []
        eldofs_loc = np.zeros((ndev, ne_max, nd), dtype=np.int64)
        for d in range(ndev):
            loc = np.full(nglobal, -1, dtype=np.int64)
            loc[owned[d]] = np.arange(len(owned[d]))
            loc[ghosts[d]] = nown_max + np.arange(len(ghosts[d]))
            self.loc_maps.append(loc)
            idx = self.elem_idx[d]
            eldofs_loc[d, :len(idx)] = loc[ed[idx]]
        self.eldofs_loc_np = eldofs_loc

        # forward-exchange publish maps: (local owned idx, iface slot) for
        # this device's owned interface dofs; pad writes go to a dead slot
        npub_max = max(1, max(
            int(np.sum(owner[iface_global] == d)) for d in range(ndev))
            if nif else 1)
        pub_src = np.full((ndev, npub_max), 0, dtype=np.int64)
        pub_dst = np.full((ndev, npub_max), nif, dtype=np.int64)  # dead
        for d in range(ndev):
            mine = iface_global[owner[iface_global] == d]
            pub_src[d, :len(mine)] = g2loc[mine]
            pub_dst[d, :len(mine)] = if2slot[mine]
        # pad-slot reads of x_own[pub_src] hit slot 0 but land in the dead
        # iface slot; reverse adds read the dead slot's 0 into owned slot 0
        # -- make those reverse adds target a dead owned slot instead:
        self.pub_src_rev_np = np.where(pub_dst < nif, pub_src, nown_max)
        self.pub_src_np = pub_src
        self.pub_dst_np = pub_dst

        ghost_src = np.full((ndev, nghost_max), nif, dtype=np.int64)
        for d in range(ndev):
            ghost_src[d, :len(ghosts[d])] = if2slot[ghosts[d]]
        self.ghost_src_np = ghost_src

    def pack_elem(self, a, fill="zero"):
        """Group an (ne, ...) per-element array into padded per-device
        batches (ndev, ne_max, ...); pad rows are zeros (``fill="zero"``,
        for quadrature weights / operator data so pads contribute nothing)
        or a copy of the device's first element (``"dup"``, for state that
        must stay finite under e.g. table evaluation)."""
        a = np.asarray(a)
        out = np.zeros((self.ndev, self.ne_max) + a.shape[1:], a.dtype)
        for d in range(self.ndev):
            idx = self.elem_idx[d]
            out[d, :len(idx)] = a[idx]
            if fill == "dup":
                # empty parts dup the global first element — pad state
                # must stay finite (0 * nan = nan under zero weights)
                out[d, len(idx):] = a[idx[0] if len(idx) else 0]
        return out

    def to_dist(self, x_global, sharding):
        """Global entity-numbered (nglobal,) -> distributed owned slabs."""
        x = np.asarray(x_global)
        out = np.zeros((self.ndev, self.nown_max), x.dtype)
        for d in range(self.ndev):
            out[d, :len(self.owned[d])] = x[self.owned[d]]
        return jax.device_put(out.reshape(-1), sharding)

    def from_dist(self, x_dist):
        """Distributed owned slabs -> global entity-numbered (nglobal,)."""
        x = np.asarray(x_dist).reshape(self.ndev, self.nown_max)
        out = np.zeros(self.nglobal, x.dtype)
        for d in range(self.ndev):
            out[self.owned[d]] = x[d, :len(self.owned[d])]
        return out


def halo_forward(x_own, pub_src, pub_dst, ghost_src, nif, nghost_max,
                 axis):
    """Inside shard_map: extend owned slabs (..., nown_max) with ghost
    values via ONE interface psum -> (..., nown_max + nghost_max)."""
    pub = jnp.zeros(x_own.shape[:-1] + (nif + 1,), x_own.dtype)
    pub = pub.at[..., pub_dst].add(x_own[..., pub_src])
    pub = jax.lax.psum(pub, axis)[..., :nif]
    gh = pub[..., ghost_src] if nif else \
        jnp.zeros(x_own.shape[:-1] + (nghost_max,), x_own.dtype)
    return jnp.concatenate([x_own, gh], axis=-1)


def halo_reverse(y_loc, pub_src_rev, pub_dst, ghost_src, nif, nown_max,
                 axis):
    """Inside shard_map: add ghost-slot contributions of local vectors
    (..., nown_max + nghost_max) back onto their owners (one psum) ->
    (..., nown_max)."""
    gcon = jnp.zeros(y_loc.shape[:-1] + (nif + 1,), y_loc.dtype)
    gcon = gcon.at[..., ghost_src].add(y_loc[..., nown_max:])
    gcon = jax.lax.psum(gcon, axis)
    pad = jnp.zeros(y_loc.shape[:-1] + (1,), y_loc.dtype)
    y_ext = jnp.concatenate([y_loc[..., :nown_max], pad], axis=-1)
    y_ext = y_ext.at[..., pub_src_rev].add(
        gcon[..., jnp.minimum(pub_dst, nif)])
    return y_ext[..., :nown_max]


def halo_assemble(v_loc, pub_src, pub_dst, pub_src_rev, ghost_src, nif,
                  nown_max, axis):
    """Inside shard_map: fully assemble additive local contributions
    (..., nown_max + nghost_max) so every copy (owner AND ghosts) holds
    the global sum — one psum.  Pad ghost slots receive dead-slot noise;
    callers must never read them (the local element dof maps don't)."""
    pub = jnp.zeros(v_loc.shape[:-1] + (nif + 1,), v_loc.dtype)
    pub = pub.at[..., pub_dst].add(v_loc[..., pub_src])
    pub = pub.at[..., ghost_src].add(v_loc[..., nown_max:])
    pub = jax.lax.psum(pub, axis)
    pad = jnp.zeros(v_loc.shape[:-1] + (1,), v_loc.dtype)
    own = jnp.concatenate([v_loc[..., :nown_max], pad], axis=-1)
    own = own.at[..., pub_src_rev].set(
        pub[..., jnp.minimum(pub_dst, nif)])[..., :nown_max]
    return jnp.concatenate([own, pub[..., ghost_src]], axis=-1)


class DofPartitionedOperator:
    """Element- and DOF-partitioned matrix-free apply of a
    (mass+)diffusion(+convection) operator over a 1-axis device mesh.

    Vectors live as (ndev * nown_max,) arrays sharded over the mesh axis:
    device d holds its owned DOF values in slots [d*nown_max, d*nown_max +
    nown[d]) with zero padding above.  ``to_dist``/``from_dist`` convert
    to/from the global entity numbering.
    """

    def __init__(self, ops, data, dev_mesh: Mesh, axis: str = "dd",
                 parts=None):
        self.ops = ops
        self.mesh = dev_mesh
        self.axis = axis
        ndev = int(dev_mesh.devices.size)
        self.ndev = ndev
        fes = ops.fes
        nglobal = fes.nscalar
        self.nglobal = nglobal

        dp = DofPartition(fes.element_dofs, nglobal, ndev, parts=parts,
                          mesh=fes.mesh)
        self.part = dp
        nif = dp.n_interface
        nown_max = dp.nown_max
        nghost_max = dp.nghost_max
        self.n_interface = nif
        self.nown_max = nown_max
        self.nghost_max = nghost_max
        self.nown = dp.nown
        self.owned = dp.owned
        self.ne_max = dp.ne_max

        blocks_in = []
        have = {}
        for name in ("d00", "d01", "d10", "d11"):
            v = getattr(data, name)
            have[name] = v is not None
            if v is not None:
                blocks_in.append(np.asarray(v))
        self._have = have

        sh = NamedSharding(dev_mesh, P(axis))
        put = lambda a: jax.device_put(
            a.reshape((ndev * a.shape[1],) + a.shape[2:]), sh)
        self.eldofs_loc = put(dp.eldofs_loc_np)
        # padding elements point at owned slot 0 with zero D blocks
        self.blocks = [put(dp.pack_elem(b, fill="zero")) for b in blocks_in]
        self.pub_src = put(dp.pub_src_np)
        self.pub_dst = put(dp.pub_dst_np)
        self.pub_src_rev = put(dp.pub_src_rev_np)
        self.ghost_src = put(dp.ghost_src_np)
        self.B = jnp.asarray(ops.B)
        self.G = jnp.asarray(ops.G)
        self._sharding = sh

        @partial(jax.shard_map, mesh=dev_mesh,
                 in_specs=(P(axis),) * (6 + len(self.blocks)),
                 out_specs=P(axis))
        def _apply(x_own, eldofs, pub_src, pub_dst, pub_src_rev, ghost_src,
                   *blocks):
            x_own = x_own.reshape(-1)
            xloc = halo_forward(x_own, pub_src.reshape(-1),
                                pub_dst.reshape(-1), ghost_src.reshape(-1),
                                nif, nghost_max, axis)
            it = iter(blocks)
            d00 = next(it) if have["d00"] else None
            d01 = next(it) if have["d01"] else None
            d10 = next(it) if have["d10"] else None
            d11 = next(it) if have["d11"] else None
            y_e = qp_block_apply(self.B, self.G, xloc[eldofs],
                                 d00, d01, d10, d11)
            y_loc = jax.ops.segment_sum(
                y_e.reshape(-1), eldofs.reshape(-1),
                num_segments=nown_max + nghost_max)
            return halo_reverse(y_loc, pub_src_rev.reshape(-1),
                                pub_dst.reshape(-1), ghost_src.reshape(-1),
                                nif, nown_max, axis)

        self._apply = _apply

    # -- layout converters ----------------------------------------------------

    def to_dist(self, x_global):
        """Global entity-numbered (nglobal,) -> distributed owned slabs."""
        return self.part.to_dist(x_global, self._sharding)

    def from_dist(self, x_dist):
        """Distributed owned slabs -> global entity-numbered (nglobal,)."""
        return self.part.from_dist(x_dist)

    def __call__(self, x_dist):
        return self._apply(x_dist, self.eldofs_loc, self.pub_src,
                           self.pub_dst, self.pub_src_rev, self.ghost_src,
                           *self.blocks)

    def per_device_floats(self):
        """Peak per-device vector length (owned + ghost) — the memory-
        scaling diagnostic: ∝ nglobal/ndev + interface."""
        return self.nown_max + self.nghost_max
