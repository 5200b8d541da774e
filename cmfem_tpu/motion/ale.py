"""Analytic ALE maps for the SCL-preserving backward-Euler verification.

Clean-room port of the reference ``AleMap``
(/root/reference/myapps/convection_diffusion/diffusion_mms_ale.cpp:213-443),
implementing the three maps of Ivancic et al. Example 7.3 with gradient G,
cofactor C = cof(G), J = det G, and the closed-form time-integrated grid
flux phi_hat.  All functions are jnp-vectorized over reference points
xhat (..., 2) and traceable in t, so per-step ALE assembly runs under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = np.pi

IDENTITY = "identity"
ACCURACY_A = "accuracy_a"
ACCURACY_B = "accuracy_b"


def parse_kind(s: str) -> str:
    s = str(s).lower()
    if s in ("identity", "id"):
        return IDENTITY
    if s in ("accuracy_a", "map_a"):
        return ACCURACY_A
    if s in ("accuracy_b", "map_b"):
        return ACCURACY_B
    raise ValueError(f"ale_map must be: identity | accuracy_a | accuracy_b. "
                     f"Got: {s}")


def _amp_a(t):
    return 0.5 * jnp.sin(PI * t)


def _shape_a(z):
    h = ((-z + 1.5) * z - 0.5) * z
    return jnp.sin(PI * h)


def _shape_a_d1(z):
    h = ((-z + 1.5) * z - 0.5) * z
    hp = (-3.0 * z + 3.0) * z - 0.5
    return PI * jnp.cos(PI * h) * hp


def _amp_b(t):
    return jnp.sin(PI * t)


class AleMap:
    def __init__(self, kind: str):
        self.kind = parse_kind(kind)

    def map_point(self, xhat, t):
        xh = xhat[..., 0]
        yh = xhat[..., 1]
        if self.kind == IDENTITY:
            return jnp.asarray(xhat)
        if self.kind == ACCURACY_A:
            a = _amp_a(t)
            return jnp.stack([xh + a * _shape_a(xh), yh + a * _shape_a(yh)],
                             axis=-1)
        a = _amp_b(t)
        q = xh * (1 - xh) * yh * (1 - yh)
        return jnp.stack([xh + a * q, yh + a * q], axis=-1)

    def gradient(self, xhat, t):
        """G = dA/dxhat, (..., 2, 2)."""
        xh = xhat[..., 0]
        yh = xhat[..., 1]
        one = jnp.ones_like(xh)
        zero = jnp.zeros_like(xh)
        if self.kind == IDENTITY:
            return jnp.stack([jnp.stack([one, zero], -1),
                              jnp.stack([zero, one], -1)], -2)
        if self.kind == ACCURACY_A:
            a = _amp_a(t)
            return jnp.stack([
                jnp.stack([1 + a * _shape_a_d1(xh), zero], -1),
                jnp.stack([zero, 1 + a * _shape_a_d1(yh)], -1)], -2)
        a = _amp_b(t)
        ax = xh * (1 - xh)
        ay = yh * (1 - yh)
        dax = 1 - 2 * xh
        day = 1 - 2 * yh
        return jnp.stack([
            jnp.stack([1 + a * dax * ay, a * ax * day], -1),
            jnp.stack([a * dax * ay, 1 + a * ax * day], -1)], -2)

    def cofactor(self, xhat, t):
        """C = cof(G): in 2D cof([[a,b],[c,d]]) = [[d,-b],[-c,a]]."""
        G = self.gradient(xhat, t)
        return jnp.stack([
            jnp.stack([G[..., 1, 1], -G[..., 0, 1]], -1),
            jnp.stack([-G[..., 1, 0], G[..., 0, 0]], -1)], -2)

    def jacobian_det(self, xhat, t):
        G = self.gradient(xhat, t)
        return (G[..., 0, 0] * G[..., 1, 1] - G[..., 0, 1] * G[..., 1, 0])

    def integrated_grid_flux(self, xhat, t0, t1):
        """phi_hat = int_{t0}^{t1} cof(G) w dt (closed form) and its
        reference divergence (IntegratedMappedGridFlux :338-407)."""
        xh = xhat[..., 0]
        yh = xhat[..., 1]
        if self.kind == IDENTITY:
            z = jnp.zeros_like(xh)
            return jnp.stack([z, z], -1), z
        if self.kind == ACCURACY_A:
            a0 = _amp_a(t0)
            a1 = _amp_a(t1)
            i1 = a1 - a0
            i2 = 0.5 * (a1 * a1 - a0 * a0)
            gx = _shape_a(xh)
            gxp = _shape_a_d1(xh)
            gy = _shape_a(yh)
            gyp = _shape_a_d1(yh)
            phi = jnp.stack([gx * (i1 + i2 * gyp), gy * (i1 + i2 * gxp)], -1)
            div = i1 * (gxp + gyp) + 2.0 * i2 * gxp * gyp
            return phi, div
        a0 = _amp_b(t0)
        a1 = _amp_b(t1)
        i1 = a1 - a0
        ax = xh * (1 - xh)
        ay = yh * (1 - yh)
        dax = 1 - 2 * xh
        day = 1 - 2 * yh
        q = ax * ay
        phi = jnp.stack([i1 * q, i1 * q], -1)
        div = i1 * (dax * ay + ax * day)
        return phi, div
