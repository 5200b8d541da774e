"""Vector-valued H1 forms: elasticity and vector diffusion.

Covers the reference's ``VectorDiffusionIntegrator`` use (mesh-velocity
Laplacian, mesh_recession_handler.cpp:229) and the BASELINE config #5
linear-elasticity path (vector H1, order 2, cantilever + CG/block-Jacobi).

DOF layout is byNODES: component c of scalar dof i lives at c*nscalar + i
(FESpace.vdof).  Applies are batched contractions + segment_sum like the
scalar path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import SpaceOps, eval_coefficient


class VectorBilinearForm:
    """Sum of vector-valued domain integrators on a vdim=dim H1 space."""

    def __init__(self, ops: SpaceOps, vdim: int | None = None):
        self.ops = ops
        self.dim = ops.G.shape[-1]
        self.vdim = vdim or self.dim
        self.n = ops.fes.nscalar
        self._parts = []  # callables gf -> qp tensor C (ne, nq, v, d, v, d)

    def add_vector_diffusion(self, coeff=1.0, time=None):
        """(c grad u_v, grad v_v) componentwise — VectorDiffusionIntegrator."""

        def build(gf):
            c = eval_coefficient(coeff, gf.xq, time) * gf.wdetJ
            eye = jnp.eye(self.vdim)
            # C[v,d,w,e] = c delta_vw delta_de (physical-gradient space)
            C = jnp.einsum("aq,vw,de->aqvdwe", c, eye, jnp.eye(self.dim))
            return C

        self._parts.append(build)
        return self

    def add_elasticity(self, lam=1.0, mu=1.0, time=None):
        """(C eps(u), eps(v)) with isotropic stiffness:
        sigma = lam tr(eps) I + 2 mu eps  — ElasticityIntegrator."""

        def build(gf):
            lam_q = eval_coefficient(lam, gf.xq, time) * gf.wdetJ
            mu_q = eval_coefficient(mu, gf.xq, time) * gf.wdetJ
            d = self.dim
            I = jnp.eye(d)
            # bilinear density: lam (div u)(div v) + 2 mu eps(u):eps(v)
            # C[v,a,w,b] acting grad(u)[w,b] -> weight for grad(v)[v,a]
            C_lam = jnp.einsum("va,wb->vawb", I, I)
            C_mu = 0.5 * (jnp.einsum("vw,ab->vawb", I, I)
                          + jnp.einsum("vb,aw->vawb", I, I)) * 2.0
            return (lam_q[..., None, None, None, None] * C_lam
                    + mu_q[..., None, None, None, None] * C_mu)

        self._parts.append(build)
        return self

    def assemble(self, gf=None):
        gf = gf or self.ops.gf
        C = None
        for p in self._parts:
            t = p(gf)
            C = t if C is None else C + t
        return C

    def _grads(self, u, gf):
        """Physical gradients of each component: (ne, nq, vdim, dim)."""
        ops = self.ops
        u_e = jnp.stack(
            [jnp.asarray(u)[c * self.n:(c + 1) * self.n][ops.eldofs]
             for c in range(self.vdim)], axis=-1)  # (ne, nd, vdim)
        gref = jnp.einsum("qnr,env->eqvr", ops.G, u_e)
        return jnp.sum(gf.invJ[:, :, None, :, :] * gref[..., :, None],
                       axis=-2)

    def apply(self, C, u, gf=None):
        """Matrix-free A u for the assembled QP stiffness C."""
        ops = self.ops
        gf = gf or ops.gf
        gu = self._grads(u, gf)  # (ne, nq, v, d)
        W = jnp.einsum("aqvdwe,aqwe->aqvd", C, gu)
        # pull back to reference gradients and scatter per component
        Wref = jnp.sum(gf.invJ[:, :, None, :, :] * W[:, :, :, None, :],
                       axis=-1)
        y_e = jnp.einsum("qnr,eqvr->envq", ops.G, Wref).sum(axis=-1)
        outs = []
        for c in range(self.vdim):
            outs.append(jax.ops.segment_sum(
                y_e[:, :, c].reshape(-1), ops.eldofs.reshape(-1),
                num_segments=self.n))
        return jnp.concatenate(outs)

    def assemble_diagonal(self, C, gf=None):
        ops = self.ops
        gf = gf or ops.gf
        # diag over components: D[c, i] = sum_q Gphys[q,i,:] C[c,:,c,:] Gphys[q,i,:]
        Gphys = jnp.einsum("mqrd,qnr->mqnd", gf.invJ, ops.G)
        outs = []
        for c in range(self.vdim):
            d_e = jnp.einsum("mqnd,mqdc,mqnc->mn",
                             Gphys, C[:, :, c, :, c, :], Gphys,
                             optimize=True)
            outs.append(jax.ops.segment_sum(
                d_e.reshape(-1), ops.eldofs.reshape(-1), num_segments=self.n))
        return jnp.concatenate(outs)


def vector_domain_lf(ops: SpaceOps, f, vdim=None, time=None, gf=None):
    """(f, v) with a vector load f(x) -> (..., vdim)."""
    gf = gf or ops.gf
    vdim = vdim or ops.G.shape[-1]
    flat = gf.xq.reshape(-1, gf.xq.shape[-1])
    vals = f(flat) if time is None else f(flat, time)
    fq = jnp.asarray(vals).reshape(gf.xq.shape[:-1] + (vdim,))
    b_e = jnp.einsum("qn,eqv->env", ops.B, fq * gf.wdetJ[..., None])
    outs = []
    for c in range(vdim):
        outs.append(jax.ops.segment_sum(
            b_e[:, :, c].reshape(-1), ops.eldofs.reshape(-1),
            num_segments=ops.fes.nscalar))
    return jnp.concatenate(outs)


def vector_boundary_lf(ops: SpaceOps, g, attr_marker=None, vdim=None,
                       time=None, vertices=None):
    """(g, v) over marked boundary faces with a vector traction g."""
    f = ops.face
    vdim = vdim or ops.G.shape[-1]
    n = ops.fes.nscalar
    if f is None:
        return jnp.zeros(n * vdim)
    ff = ops.face_factors(vertices)
    flat = ff.xq.reshape(-1, ff.xq.shape[-1])
    vals = g(flat) if time is None else g(flat, time)
    gq = jnp.asarray(vals).reshape(ff.xq.shape[:-1] + (vdim,))
    if attr_marker is not None:
        mask = np.isin(f["attr"], np.asarray(list(attr_marker)))
        gq = gq * jnp.asarray(mask, dtype=gq.dtype)[:, None, None]
    b_f = jnp.einsum("qn,fqv->fnv", f["B"], gq * ff.wdS[..., None])
    outs = []
    for c in range(vdim):
        outs.append(jax.ops.segment_sum(
            b_f[:, :, c].reshape(-1), f["dofs"].reshape(-1), num_segments=n))
    return jnp.concatenate(outs)
