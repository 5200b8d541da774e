"""Global sum-factorized operator apply for structured hex grids.

The TPU speed-of-light path for the BASELINE headline op.  Per-element
gather/scatter is pathological on TPU (35/27 ms at 913k DOFs for strided
lattice slicing; far worse for scalar segment_sum), so this path removes it
entirely: with a tensor-product grid, interpolation of values and gradients
to ALL quadrature points is three axis-wise dense matmuls applied to the
3D DOF lattice (spectral-element sum factorization, operating on the
global tensor product rather than per element):

    V   = Az (x) Ay (x) Ax  u3          (values at every QP)
    Gx  = Az (x) Ay (x) DAx u3          (reference x-gradients), etc.

where A/DA are ((n_elem * nq1d), ndof1d) block-banded 1D interpolation
matrices.  The QP operator blocks D are pre-permuted (static) into the
same QP-lattice layout, the 4x4 block action is pointwise, and the
transposed chains assemble y3 directly — matmuls and elementwise ops only,
all MXU/VPU friendly, no scatter.  All matmuls run at Precision.HIGHEST
(true-f32; 0/1-structured operands make the selection exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import SpaceOps, OperatorData
from ..core.quadrature import _gauss_1d
from ..core.reference_elements import gauss_lobatto_nodes
from .partial import pack_qp_blocks_T

HI = jax.lax.Precision.HIGHEST


def _lagrange_tab_1d(p: int, q1: int):
    """1D basis values/derivatives at q1 Gauss points: (q1, p+1) each."""
    from ..core.reference_elements import _lagrange_1d

    nodes = gauss_lobatto_nodes(p)
    x, w = _gauss_1d(q1)
    B, G = _lagrange_1d(nodes, x)
    return B, G, w


def _axis_matrices(n_el: int, p: int, q1: int):
    """Block-banded (n_el*q1, n_el*p+1) interpolation + derivative matrices."""
    B, G, _ = _lagrange_tab_1d(p, q1)
    N = n_el * p + 1
    A = np.zeros((n_el * q1, N))
    DA = np.zeros((n_el * q1, N))
    for e in range(n_el):
        for q in range(q1):
            A[e * q1 + q, e * p:e * p + p + 1] = B[q]
            DA[e * q1 + q, e * p:e * p + p + 1] = G[q]
    return A, DA


class SumFactoredOperator:
    """Matrix-free structured-grid operator with zero gather/scatter.

    Built from a SpaceOps/OperatorData pair on a ``make_cartesian_mesh_3d``
    mesh; acts on lattice-numbered DOF vectors (same numbering as
    StructuredGrid3D)."""

    def __init__(self, ops: SpaceOps, data: OperatorData, nx, ny, nz,
                 order: int, dtype=jnp.float32):
        self.dtype = dtype
        p = order
        quad = ops.quad
        q1 = round(len(quad.weights) ** (1 / 3))
        assert q1**3 == len(quad.weights), "expects a tensor quadrature rule"
        self.n = (nx, ny, nz)
        self.q1 = q1
        self.p = p
        self.NX, self.NY, self.NZ = nx * p + 1, ny * p + 1, nz * p + 1
        self.ndofs = self.NX * self.NY * self.NZ

        Ax, DAx = _axis_matrices(nx, p, q1)
        Ay, DAy = _axis_matrices(ny, p, q1)
        Az, DAz = _axis_matrices(nz, p, q1)
        self.Ax = jnp.asarray(Ax, dtype)
        self.DAx = jnp.asarray(DAx, dtype)
        self.Ay = jnp.asarray(Ay, dtype)
        self.DAy = jnp.asarray(DAy, dtype)
        self.Az = jnp.asarray(Az, dtype)
        self.DAz = jnp.asarray(DAz, dtype)

        # permute D blocks from (m*m, nq, ne) [q z-major, e (k,j,i)-major]
        # to the QP lattice (Kz, Ky, Kx) with K* = n* x q1.
        # Structure-aware compression: when the grad-grad block is symmetric
        # and there is no grad-test/value-trial coupling (true for
        # mass+diffusion+convection), only 10 of the 16 planes are stored —
        # D traffic is the bandwidth floor of this operator.
        Dflat, _ = pack_qp_blocks_T(ops, data, dtype)
        mm, nq, ne = Dflat.shape
        self.m = int(round(np.sqrt(mm)))
        m = self.m
        Dnp = np.asarray(Dflat)
        sym = all(
            np.allclose(Dnp[r * m + s_], Dnp[s_ * m + r], rtol=1e-12, atol=0)
            for r in range(1, m) for s_ in range(r + 1, m))
        no_d10 = all(not np.any(Dnp[r * m]) for r in range(1, m))
        self.compressed = bool(sym and no_d10)
        if self.compressed:
            # plane order: D00, D0x, D0y, D0z, Dxx, Dxy, Dxz, Dyy, Dyz, Dzz
            planes = [Dnp[0]]
            planes += [Dnp[s_] for s_ in range(1, m)]
            self._pairs = []
            for r in range(1, m):
                for s_ in range(r, m):
                    planes.append(Dnp[(r) * m + s_])
                    self._pairs.append((r, s_))
            Dnp = np.stack(planes, axis=0)
            mm = Dnp.shape[0]
            Dflat = jnp.asarray(Dnp)
        qz, qy, qx = np.meshgrid(np.arange(q1), np.arange(q1), np.arange(q1),
                                 indexing="ij")
        k, j, i = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                              indexing="ij")
        # flat (q, e) index for every lattice point
        q_idx = (qz * q1 + qy) * q1 + qx  # (q1,q1,q1)
        e_idx = (k * ny + j) * nx + i     # (nz,ny,nx)
        lat_q = np.zeros((nz * q1, ny * q1, nx * q1), dtype=np.int64)
        lat_e = np.zeros_like(lat_q)
        for kk in range(nz):
            for jj in range(ny):
                for ii in range(nx):
                    lat_q[kk * q1:(kk + 1) * q1, jj * q1:(jj + 1) * q1,
                          ii * q1:(ii + 1) * q1] = q_idx
                    lat_e[kk * q1:(kk + 1) * q1, jj * q1:(jj + 1) * q1,
                          ii * q1:(ii + 1) * q1] = e_idx[kk, jj, ii]
        flat = (lat_q * ne + lat_e).reshape(-1)
        Dl = np.asarray(Dflat).reshape(mm, nq * ne)[:, flat]
        self.Kz, self.Ky, self.Kx = nz * q1, ny * q1, nx * q1
        self.D = jnp.asarray(Dl.reshape(mm, self.Kz, self.Ky, self.Kx), dtype)

    def bind(self, use_pallas: bool = False, tile: int = 256,
             interpret: bool = False):
        """(fn(u, D) -> y, D) with all big arrays as jit args.

        use_pallas fuses the z-contraction -> D-apply -> transposed
        z-contraction inside VMEM (the V/W quadrature fields never touch
        HBM): measured 574 -> 673 MDOF/s at order 2, 913k DOFs on v5e.
        Requires the compressed packing and Ky*Kx % tile == 0.
        interpret runs the kernel in pallas interpret mode (CPU testing)."""
        if use_pallas:
            if not self.compressed:
                raise ValueError("pallas sumfact path requires compressed D")
            return self._bind_pallas(tile, interpret), self.D.reshape(
                self.D.shape[0], self.Kz, self.Ky * self.Kx)
        Ax, DAx = self.Ax, self.DAx
        Ay, DAy = self.Ay, self.DAy
        Az, DAz = self.Az, self.DAz
        NX, NY, NZ = self.NX, self.NY, self.NZ
        m = self.m

        def fwd(u3, Mx, My, Mz):
            # contract each axis in turn: (NZ,NY,NX) -> (Kz,Ky,Kx)
            t = jnp.einsum("ax,zyx->zya", Mx, u3, precision=HI)
            t = jnp.einsum("by,zya->zba", My, t, precision=HI)
            return jnp.einsum("cz,zba->cba", Mz, t, precision=HI)

        def bwd(w3, Mx, My, Mz):
            t = jnp.einsum("cz,cba->zba", Mz, w3, precision=HI)
            t = jnp.einsum("by,zba->zya", My, t, precision=HI)
            return jnp.einsum("ax,zya->zyx", Mx, t, precision=HI)

        def fn(u, D):
            u3 = u.astype(self.dtype).reshape(NZ, NY, NX)
            V = [
                fwd(u3, Ax, Ay, Az),     # values
                fwd(u3, DAx, Ay, Az),    # d/dxi_x
                fwd(u3, Ax, DAy, Az),    # d/dxi_y
                fwd(u3, Ax, Ay, DAz),    # d/dxi_z
            ]
            if self.compressed:
                # planes: [D00, D0x.., upper-tri Dss]; d10 = 0; Dss symmetric
                W = [D[0] * V[0]]
                for s in range(1, m):
                    W[0] = W[0] + D[s] * V[s]
                Wg = [None] * (m - 1)
                for k, (r, s) in enumerate(self._pairs):
                    plane = D[m + k]
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
                        t = D[r * m + s] * V[s]
                        acc = t if acc is None else acc + t
                    W.append(acc)
            y3 = bwd(W[0], Ax, Ay, Az)
            y3 = y3 + bwd(W[1], DAx, Ay, Az)
            y3 = y3 + bwd(W[2], Ax, DAy, Az)
            y3 = y3 + bwd(W[3], Ax, Ay, DAz)
            return y3.reshape(-1)

        return fn, self.D

    def _bind_pallas(self, tile: int, interpret: bool = False):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Ax, DAx, Ay, DAy = self.Ax, self.DAx, self.Ay, self.DAy
        Az = jnp.asarray(self.Az)
        DAz = jnp.asarray(self.DAz)
        NX, NY, NZ = self.NX, self.NY, self.NZ
        Kz, Ky, Kx = self.Kz, self.Ky, self.Kx
        m = self.m
        mm = self.D.shape[0]
        pairs = self._pairs
        dtype = self.dtype
        KK = Ky * Kx
        if KK % tile:
            raise ValueError(f"Ky*Kx={KK} must divide by tile={tile}")

        def kernel(az_ref, azt_ref, daz_ref, dazt_ref, t0_ref, tx_ref,
                   ty_ref, d_ref, u0_ref, ux_ref, uy_ref, uz_ref):
            Azl = az_ref[...]
            Azt = azt_ref[...]
            V = [
                jnp.dot(Azl, t0_ref[...],
                        preferred_element_type=dtype, precision=HI),
                jnp.dot(Azl, tx_ref[...],
                        preferred_element_type=dtype, precision=HI),
                jnp.dot(Azl, ty_ref[...],
                        preferred_element_type=dtype, precision=HI),
                jnp.dot(daz_ref[...], t0_ref[...],
                        preferred_element_type=dtype, precision=HI),
            ]
            Dl = d_ref[...]
            W0 = Dl[0] * V[0]
            for s in range(1, m):
                W0 = W0 + Dl[s] * V[s]
            Wg = [None] * (m - 1)
            for k, (r, s) in enumerate(pairs):
                plane = Dl[m + k]
                t = plane * V[s]
                Wg[r - 1] = t if Wg[r - 1] is None else Wg[r - 1] + t
                if s != r:
                    t2 = plane * V[r]
                    Wg[s - 1] = t2 if Wg[s - 1] is None else Wg[s - 1] + t2
            u0_ref[...] = jnp.dot(Azt, W0,
                                  preferred_element_type=dtype,
                                  precision=HI)
            ux_ref[...] = jnp.dot(Azt, Wg[0],
                                  preferred_element_type=dtype,
                                  precision=HI)
            uy_ref[...] = jnp.dot(Azt, Wg[1],
                                  preferred_element_type=dtype,
                                  precision=HI)
            uz_ref[...] = jnp.dot(dazt_ref[...], Wg[2],
                                  preferred_element_type=dtype,
                                  precision=HI)

        def fn(u, Dr):
            u3 = u.astype(dtype).reshape(NZ, NY, NX)

            def xy(Mx, My):
                t = jnp.einsum("ax,zyx->zya", Mx, u3, precision=HI)
                return jnp.einsum("by,zya->zba", My, t,
                                  precision=HI).reshape(NZ, KK)

            # the value and z-gradient fields share the same x/y chain
            T0 = xy(Ax, Ay)
            Tx = xy(DAx, Ay)
            Ty = xy(Ax, DAy)
            outs = pl.pallas_call(
                kernel,
                out_shape=[jax.ShapeDtypeStruct((NZ, KK), dtype)] * 4,
                grid=(KK // tile,),
                in_specs=[
                    pl.BlockSpec((Kz, NZ), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NZ, Kz), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Kz, NZ), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NZ, Kz), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NZ, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NZ, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NZ, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((mm, Kz, tile), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[pl.BlockSpec((NZ, tile), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)] * 4,
                interpret=interpret,
            )(Az, Az.T, DAz, DAz.T, T0, Tx, Ty, Dr)
            U0, Uxx, Uyy, Uzz = [o.reshape(NZ, Ky, Kx) for o in outs]

            def xyt(U, Mx, My):
                t = jnp.einsum("by,zba->zya", My, U, precision=HI)
                return jnp.einsum("ax,zya->zyx", Mx, t, precision=HI)

            y3 = (xyt(U0, Ax, Ay) + xyt(Uxx, DAx, Ay)
                  + xyt(Uyy, Ax, DAy) + xyt(Uzz, Ax, Ay))
            return y3.reshape(-1)

        return fn

    def __call__(self, u):
        fn, D = self.bind()
        return fn(u, D)
