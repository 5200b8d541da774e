"""DOF-partitioned ablation (T, p) Newton step: flagship memory ∝ 1/N.

``parallel.ablation_sharded`` distributes the flagship coupled solve's
*work* (element quadrature, AD Jacobians, GMRES matvecs) but replicates
the (T, p) DOF vectors on every device.  This module removes that last
replication: each device stores only its owned slab of both fields (plus
ghost copies of partition-interface DOFs), the unstructured analog of the
reference running its ablation drivers on a ParFiniteElementSpace under
``mpirun -np N`` (true-dof vectors distributed by construction,
linear_convection_diffusion_2D.cpp:312-322 / SURVEY.md §2.4).

Layout: a distributed two-field vector is (ndev * 2 * nown_max,), sharded
over the mesh axis, device d holding [T_own_d | p_own_d].  Every halo
exchange moves BOTH fields in ONE interface psum (a (2, nif) stack); an
operator apply costs two such psums (forward values, reverse ghost
contributions), and the equilibration/PC build assembles its diagonals
with one more.  The jittable GMRES from ``solvers.krylov`` runs on the
distributed vectors under GSPMD — dot products lower to psums, padding
slots stay identically zero.

SEB surface physics (cases 2.1/2.2): each top-boundary face is packed
onto the device owning its adjacent element, whose DOFs are present in
that device's [owned | ghost] space by construction — the face residual
and its AD blocks add no communication.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..physics.ablation import AblationSystem
from ..solvers.blocksolve import equilibrated_block_factors
from ..solvers.krylov import gmres
from .dofpart import DofPartition, halo_forward, halo_reverse, halo_assemble


class DofPartitionedAblationNewton:
    """Distributed-residual / AD-Jacobian / block-GMRES for the coupled
    (T, p) ablation system with DOF-partitioned vectors.

    Covers the static-mesh solves (cases 1 and 2.1) AND the moving-mesh
    driver (case 2.2): ``update_geometry`` refreshes the packed geometric
    factors after each mesh move (the ParFiniteElementSpace-under-MoveNodes
    analog, mesh_recession_handler.cpp:299), and ``residual``/``prepare``
    accept per-step ALE mesh-velocity slabs (``wq``) and GCL J_old/J_new
    slabs (``gcl``) packed via ``pack_elem``."""

    def __init__(self, system: AblationSystem, dev_mesh: Mesh, ess_T, ess_p,
                 axis: str = "dd", restart: int = 400, maxiter: int = 10,
                 seb=None, parts=None, ale_toggles=(True, True, True),
                 gcl_enabled=False):
        self.sys = system
        self.mesh = dev_mesh
        self.axis = axis
        self.n = system.n
        self.nd = int(system.ops.eldofs.shape[1])
        self.restart = int(restart)
        self.maxiter = int(maxiter)
        self.seb = seb
        self.ale_toggles = tuple(ale_toggles)
        self.gcl_enabled = bool(gcl_enabled)
        ndev = int(dev_mesh.devices.size)
        self.ndev = ndev

        ops = system.ops
        dp = DofPartition(np.asarray(ops.eldofs, dtype=np.int64), self.n,
                          ndev, parts=parts, mesh=ops.fes.mesh)
        self.part = dp
        self.nown_max = dp.nown_max
        self.n_loc = dp.n_loc

        sh = NamedSharding(dev_mesh, P(axis))
        self._sharding = sh
        self._put = lambda a: jax.device_put(
            np.asarray(a).reshape((ndev * a.shape[1],) + a.shape[2:]), sh)

        self.eldofs_loc = self._put(dp.eldofs_loc_np)
        self.invJ = self._put(dp.pack_elem(np.asarray(ops.gf.invJ), "dup"))
        # zero quadrature weights null every padded-element contribution
        self.wdetJ = self._put(dp.pack_elem(np.asarray(ops.gf.wdetJ),
                                            "zero"))
        self.pub_src = self._put(dp.pub_src_np)
        self.pub_dst = self._put(dp.pub_dst_np)
        self.pub_src_rev = self._put(dp.pub_src_rev_np)
        self.ghost_src = self._put(dp.ghost_src_np)

        # -- essential / padding masks -------------------------------------
        maskT = np.zeros(self.n, dtype=bool)
        maskT[np.asarray(ess_T, dtype=np.int64)] = True
        maskp = np.zeros(self.n, dtype=bool)
        maskp[np.asarray(ess_p, dtype=np.int64)] = True

        def local_mask(m):
            out = np.ones((ndev, dp.n_loc), dtype=bool)  # pads masked
            for d in range(ndev):
                out[d, :len(dp.owned[d])] = m[dp.owned[d]]
                out[d, dp.nown_max:dp.nown_max + len(dp.ghosts[d])] = \
                    m[dp.ghosts[d]]
            return out

        mT_loc = local_mask(maskT)
        mp_loc = local_mask(maskp)
        self.mask2_loc = self._put(
            np.concatenate([mT_loc, mp_loc], axis=1))     # (ndev, 2 n_loc)
        own = slice(0, dp.nown_max)
        self.mask_own2 = self._put(
            np.concatenate([mT_loc[:, own], mp_loc[:, own]], axis=1))
        # element-local essential masks; pad rows all-zero so padded
        # elements contribute NO identity diagonals to the equilibration
        ed = np.asarray(ops.eldofs, dtype=np.int64)
        lmask_g = np.concatenate([maskT[ed], maskp[ed]], axis=1)
        self.lmask = self._put(dp.pack_elem(lmask_g, "zero"))

        # -- SEB faces packed onto the adjacent element's device -----------
        if seb is not None:
            tr = system.trace
            elem = np.asarray(tr.elem, dtype=np.int64)
            if len(elem) == 0:
                raise ValueError(
                    "SEB enabled but the top-boundary trace selects no "
                    "faces — check the boundary attribute")
            fowner = dp.parts[elem]
            counts = np.bincount(fowner, minlength=ndev)
            nfmax = max(1, int(counts.max()))
            self.nf_local = nfmax
            # position of each element within its device's packed batch
            epos = np.full(system.ne, -1, dtype=np.int64)
            for d in range(ndev):
                epos[dp.elem_idx[d]] = np.arange(len(dp.elem_idx[d]))
            ff = tr.face_factors()
            eldofs_f_loc = np.zeros((len(elem), tr.eldofs.shape[1]),
                                    dtype=np.int64)
            for i, (e, d) in enumerate(zip(elem, fowner)):
                eldofs_f_loc[i] = dp.loc_maps[d][np.asarray(tr.eldofs)[i]]
                assert (eldofs_f_loc[i] >= 0).all(), \
                    "face dof missing from its device's local space"
            fdata = {
                "Bf": np.asarray(tr.Btab)[tr.combo],
                "Gf": np.asarray(tr.Gtab)[tr.combo],
                "invJf": np.asarray(tr.element_invJ()),
                "nrm": np.asarray(ff.normal),
                "wdS": np.asarray(ff.wdS),
                "eldofs_f": eldofs_f_loc,
                "elem_local": epos[elem],
            }
            slot = np.zeros(len(elem), dtype=np.int64)
            for d in range(ndev):
                idx = np.nonzero(fowner == d)[0]
                slot[idx] = np.arange(len(idx))
            self._f_dst = fowner * nfmax + slot
            self._f = {k: self._pack_face(k, a) for k, a in fdata.items()}

        self._wq0 = None
        self._J0 = None
        self._residual_j = jax.jit(self._residual_impl)
        self._prepare_j = jax.jit(self._prepare_impl)
        self._solve = jax.jit(self._solve_impl)

    def _pack_face(self, k, a):
        """Per-face host array -> per-device packed batches (faces ride the
        device owning their adjacent element)."""
        a = np.asarray(a)
        shape = (self.ndev * self.nf_local,) + a.shape[1:]
        if k in ("wdS", "elem_local", "eldofs_f"):
            out = np.zeros(shape, dtype=a.dtype)
        else:
            out = np.broadcast_to(a[:1], shape).copy()
        out[self._f_dst] = a
        return jax.device_put(out, self._sharding)

    def update_geometry(self, vertices):
        """Refresh the packed geometric factors (and SEB face geometry)
        for moved mesh vertices — the case-2.2 ALE step.  Packed arrays
        are jit ARGUMENTS, so no retrace; the reference analog is
        ParFiniteElementSpace under MoveNodes
        (mesh_recession_handler.cpp:299)."""
        dp = self.part
        gf = self.sys.ops.geometric_factors(jnp.asarray(vertices))
        self.invJ = self._put(dp.pack_elem(np.asarray(gf.invJ), "dup"))
        self.wdetJ = self._put(dp.pack_elem(np.asarray(gf.wdetJ), "zero"))
        if self.seb is not None:
            tr = self.sys.trace
            ff = tr.face_factors(vertices)
            for k, a in (("invJf", tr.element_invJ(vertices)),
                         ("nrm", ff.normal), ("wdS", ff.wdS)):
                self._f[k] = self._pack_face(k, a)

    def _ale_defaults(self, wq, gcl):
        """Packed zero mesh-velocity / -1 Jacobian slabs when the caller
        has none (static mesh); built once and cached."""
        if wq is None:
            if self._wq0 is None:
                gfq = np.asarray(self.sys.ops.gf.wdetJ)
                dim = np.asarray(self.sys.ops.gf.invJ).shape[-1]
                self._wq0 = self.pack_elem(
                    np.zeros(gfq.shape + (dim,)), "zero")
            wq = self._wq0
        if gcl is None:
            if self._J0 is None:
                gfq = np.asarray(self.sys.ops.gf.wdetJ)
                self._J0 = self.pack_elem(np.full(gfq.shape, -1.0), "dup")
            gcl = (self._J0, self._J0)
        return wq, gcl

    # -- layout converters ----------------------------------------------------

    def pack_elem(self, a, fill="dup"):
        """Host (ne, ...) per-element array -> packed per-device batches,
        device_put over the mesh (old-state slabs To/po/Xo)."""
        return self._put(self.part.pack_elem(np.asarray(a), fill))

    def to_dist2(self, T, p):
        """Global (n,) T and p -> one distributed two-field vector."""
        dp = self.part
        out = np.zeros((self.ndev, 2 * dp.nown_max),
                       np.result_type(np.asarray(T), np.asarray(p)))
        T = np.asarray(T)
        p = np.asarray(p)
        for d in range(self.ndev):
            k = len(dp.owned[d])
            out[d, :k] = T[dp.owned[d]]
            out[d, dp.nown_max:dp.nown_max + k] = p[dp.owned[d]]
        return jax.device_put(out.reshape(-1), self._sharding)

    def from_dist2(self, y):
        """Distributed two-field vector -> global (T, p) arrays."""
        dp = self.part
        y = np.asarray(y).reshape(self.ndev, 2 * dp.nown_max)
        T = np.zeros(dp.nglobal, y.dtype)
        p = np.zeros(dp.nglobal, y.dtype)
        for d in range(self.ndev):
            k = len(dp.owned[d])
            T[dp.owned[d]] = y[d, :k]
            p[dp.owned[d]] = y[d, dp.nown_max:dp.nown_max + k]
        return T, p

    def per_device_floats(self):
        """Peak per-device two-field vector length (owned + ghost)."""
        return 2 * self.n_loc

    # -- shard_map body helpers -------------------------------------------------

    def _halo2(self, y_own2, pub_src, pub_dst, ghost_src):
        """Per-device [T_own; p_own] (2 nown_max,) -> halo-extended
        (2, n_loc) via one stacked interface psum."""
        dp = self.part
        x2 = y_own2.reshape(2, dp.nown_max)
        return halo_forward(x2, pub_src, pub_dst, ghost_src,
                            dp.n_interface, dp.nghost_max, self.axis)

    def _face_vals(self):
        if self.seb is None:
            return ()
        return tuple(self._f[k] for k in
                     ("Bf", "Gf", "invJf", "nrm", "wdS", "eldofs_f",
                      "elem_local"))

    # -- residual -------------------------------------------------------------

    def _residual_impl(self, y, To, po, Xo, dt, bc, fvals, wqe_g, Jo_g,
                       Jn_g):
        axis = self.axis
        dp = self.part
        elem_res = self.sys.elem_residual_fn(dt,
                                             gcl_enabled=self.gcl_enabled,
                                             ale_toggles=self.ale_toggles)
        with_seb = self.seb is not None
        n_loc = dp.n_loc

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P(axis),) * 12 + (P(),)
                 + tuple(P(axis) for _ in fvals) + (P(axis),) * 3,
                 out_specs=P(axis))
        def _res(y_own2, eldofs, invJ, wdetJ, To, po, Xo, pub_src, pub_dst,
                 pub_src_rev, ghost_src, mask_own2, bc, *fargs):
            fargs, (wqe, Jo, Jn) = fargs[:-3], fargs[-3:]
            pub_src = pub_src.reshape(-1)
            pub_dst = pub_dst.reshape(-1)
            pub_src_rev = pub_src_rev.reshape(-1)
            ghost_src = ghost_src.reshape(-1)
            xloc2 = self._halo2(y_own2, pub_src, pub_dst, ghost_src)
            Tloc, ploc = xloc2[0], xloc2[1]
            rT_e, rp_e = jax.vmap(elem_res)(
                Tloc[eldofs], ploc[eldofs], invJ, wdetJ, To, po, Xo,
                wqe, Jo, Jn)
            flat = eldofs.reshape(-1)
            yT = jax.ops.segment_sum(rT_e.reshape(-1), flat,
                                     num_segments=n_loc)
            yp = jax.ops.segment_sum(rp_e.reshape(-1), flat,
                                     num_segments=n_loc)
            if with_seb:
                branch, model, bprime = self.seb
                Bf, Gf, invJf, nrm, wdS, eldofs_f, elem_local = fargs
                face_res = self.sys.seb_face_res_fn(branch, model, bprime)
                rTf = jax.vmap(face_res,
                               in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))(
                    Tloc[eldofs_f], ploc[eldofs_f], Bf, Gf, invJf, nrm,
                    wdS, Xo[elem_local, 0], bc)
                yT = yT + jax.ops.segment_sum(rTf.reshape(-1),
                                              eldofs_f.reshape(-1),
                                              num_segments=n_loc)
            y2 = halo_reverse(jnp.stack([yT, yp]), pub_src_rev, pub_dst,
                              ghost_src, dp.n_interface, dp.nown_max,
                              axis)
            return jnp.where(mask_own2, 0.0, y2.reshape(-1))

        return _res(y, self.eldofs_loc, self.invJ, self.wdetJ, To, po, Xo,
                    self.pub_src, self.pub_dst, self.pub_src_rev,
                    self.ghost_src, self.mask_own2, bc, *fvals,
                    wqe_g, Jo_g, Jn_g)

    def residual(self, y, To, po, Xo, dt, bc=None, wq=None, gcl=None):
        """BC-masked distributed residual of the distributed two-field
        vector ``y``; old-state slabs To/po/Xo (and optional ALE wq /
        GCL J_old,J_new slabs) from ``pack_elem``."""
        wq, gcl = self._ale_defaults(wq, gcl)
        return self._residual_j(y, To, po, Xo, jnp.asarray(dt), bc,
                                self._face_vals(), wq, gcl[0], gcl[1])

    # -- Jacobian preparation ----------------------------------------------------

    def _prepare_impl(self, y, To, po, Xo, dt, bc, fvals, wqe_g, Jo_g,
                      Jn_g):
        axis = self.axis
        dp = self.part
        elem_res = self.sys.elem_residual_fn(dt,
                                             gcl_enabled=self.gcl_enabled,
                                             ale_toggles=self.ale_toggles)
        with_seb = self.seb is not None
        nd = self.nd
        n_loc = dp.n_loc
        nown = dp.nown_max

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P(axis),) * 13 + (P(),)
                 + tuple(P(axis) for _ in fvals) + (P(axis),) * 3,
                 out_specs=(P(axis), P(axis), P(axis)))
        def _prep(y_own2, eldofs, invJ, wdetJ, To, po, Xo, lmask,
                  mask2_loc, pub_src, pub_dst, pub_src_rev, ghost_src,
                  bc, *fargs):
            fargs, (wqe, Jo, Jn) = fargs[:-3], fargs[-3:]
            pub_src = pub_src.reshape(-1)
            pub_dst = pub_dst.reshape(-1)
            pub_src_rev = pub_src_rev.reshape(-1)
            ghost_src = ghost_src.reshape(-1)
            mask2_loc = mask2_loc.reshape(-1)
            xloc2 = self._halo2(y_own2, pub_src, pub_dst, ghost_src)
            Tloc, ploc = xloc2[0], xloc2[1]
            jac = jax.vmap(jax.jacfwd(elem_res, argnums=(0, 1)))
            (JTT, JTp), (JpT, Jpp) = jac(Tloc[eldofs], ploc[eldofs], invJ,
                                         wdetJ, To, po, Xo, wqe, Jo, Jn)
            top = jnp.concatenate([JTT, JTp], axis=2)
            bot = jnp.concatenate([JpT, Jpp], axis=2)
            Je = jnp.concatenate([top, bot], axis=1)
            if with_seb:
                branch, model, bprime = self.seb
                Bf, Gf, invJf, nrm, wdS, eldofs_f, elem_local = fargs
                face_res = self.sys.seb_face_res_fn(branch, model, bprime)
                jacf = jax.vmap(jax.jacfwd(face_res, argnums=(0, 1)),
                                in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))
                FJT, FJp = jacf(Tloc[eldofs_f], ploc[eldofs_f], Bf, Gf,
                                invJf, nrm, wdS, Xo[elem_local, 0], bc)
                Fe = jnp.concatenate([FJT, FJp], axis=2)
                Je = Je.at[elem_local, :nd, :].add(Fe)

            def gather_loc(x):
                xT = x[:n_loc][eldofs]
                xp = x[n_loc:][eldofs]
                return jnp.concatenate([xT, xp], axis=1)

            def scatter_loc(y_e):
                flat = eldofs.reshape(-1)
                yT = jax.ops.segment_sum(y_e[:, :nd].reshape(-1), flat,
                                         num_segments=n_loc)
                yp = jax.ops.segment_sum(y_e[:, nd:].reshape(-1), flat,
                                         num_segments=n_loc)
                return jnp.concatenate([yT, yp])

            def assemble2(v):
                v2 = halo_assemble(v.reshape(2, n_loc), pub_src, pub_dst,
                                   pub_src_rev, ghost_src,
                                   dp.n_interface, nown, axis)
                return v2.reshape(-1)

            Je_s, pb, s = equilibrated_block_factors(
                Je, lmask, mask2_loc, gather_loc, scatter_loc, nd, n_loc,
                reduce_fn=assemble2)
            # owned-slab views for the distributed GMRES
            pb_own = pb[:, :nown].T                       # (nown_max, 4)
            s_own = jnp.concatenate([s[:nown], s[n_loc:n_loc + nown]])
            return Je_s, pb_own, s_own

        return _prep(y, self.eldofs_loc, self.invJ, self.wdetJ, To, po,
                     Xo, self.lmask, self.mask2_loc, self.pub_src,
                     self.pub_dst, self.pub_src_rev, self.ghost_src, bc,
                     *fvals, wqe_g, Jo_g, Jn_g)

    def prepare(self, y, To, po, Xo, dt, bc=None, wq=None, gcl=None):
        """AD-assemble, BC-eliminate, and equilibrate on-device; returns
        (Je_s sharded element blocks, pb owned-slab PC, s owned-slab
        scaling)."""
        wq, gcl = self._ale_defaults(wq, gcl)
        return self._prepare_j(y, To, po, Xo, jnp.asarray(dt), bc,
                               self._face_vals(), wq, gcl[0], gcl[1])

    # -- linear solve --------------------------------------------------------------

    def _solve_impl(self, Je_s, pb_own, s_own, b, rtol, atol):
        axis = self.axis
        dp = self.part
        nd = self.nd
        n_loc = dp.n_loc
        nown = dp.nown_max

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P(axis),) * 8, out_specs=P(axis))
        def _mv(y_own2, eldofs, Je_s, pub_src, pub_dst, pub_src_rev,
                ghost_src, mask_own2):
            pub_src = pub_src.reshape(-1)
            pub_dst = pub_dst.reshape(-1)
            pub_src_rev = pub_src_rev.reshape(-1)
            ghost_src = ghost_src.reshape(-1)
            xloc2 = self._halo2(y_own2, pub_src, pub_dst, ghost_src)
            x_e = jnp.concatenate([xloc2[0][eldofs], xloc2[1][eldofs]],
                                  axis=1)
            y_e = jnp.einsum("eij,ej->ei", Je_s, x_e)
            flat = eldofs.reshape(-1)
            yT = jax.ops.segment_sum(y_e[:, :nd].reshape(-1), flat,
                                     num_segments=n_loc)
            yp = jax.ops.segment_sum(y_e[:, nd:].reshape(-1), flat,
                                     num_segments=n_loc)
            y2 = halo_reverse(jnp.stack([yT, yp]), pub_src_rev, pub_dst,
                              ghost_src, dp.n_interface, nown, axis)
            # essential/pad rows pinned to the identity
            return jnp.where(mask_own2, y_own2, y2.reshape(-1))

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P(axis), P(axis)), out_specs=P(axis))
        def _M(pb_own, r):
            rT, rp = r[:nown], r[nown:]
            return jnp.concatenate([pb_own[:, 0] * rT + pb_own[:, 1] * rp,
                                    pb_own[:, 2] * rT + pb_own[:, 3] * rp])

        res = gmres(lambda v: _mv(v, self.eldofs_loc, Je_s, self.pub_src,
                                  self.pub_dst, self.pub_src_rev,
                                  self.ghost_src, self.mask_own2),
                    s_own * b, M=lambda r: _M(pb_own, r), rtol=rtol,
                    atol=atol, restart=self.restart, maxiter=self.maxiter)
        return res._replace(x=s_own * res.x)

    def solve(self, factors, b, rtol=1e-10, atol=0.0):
        """Distributed GMRES solve of J dx = b (factors from ``prepare``);
        b and x are distributed two-field vectors."""
        Je_s, pb_own, s_own = factors
        return self._solve(Je_s, pb_own, s_own, jnp.asarray(b),
                           jnp.asarray(rtol, dtype=jnp.result_type(b)),
                           jnp.asarray(atol, dtype=jnp.result_type(b)))

    # -- one full Newton iterate ---------------------------------------------------

    def newton_step(self, y, To, po, Xo, dt, rtol=1e-10, bc=None, wq=None,
                    gcl=None):
        """One distributed Newton iterate on the distributed two-field
        vector; returns (y', |R|, gmres cycles).  Essential DOFs are held
        fixed (the caller pre-sets BC values in y)."""
        R = self.residual(y, To, po, Xo, dt, bc=bc, wq=wq, gcl=gcl)
        fac = self.prepare(y, To, po, Xo, dt, bc=bc, wq=wq, gcl=gcl)
        res = self.solve(fac, -R, rtol=rtol)
        return y + res.x, jnp.linalg.norm(R), res.iters
