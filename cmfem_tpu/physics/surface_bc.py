"""Time-tabulated aerothermal boundary environment + top-T schedules.

Clean-room port of the reference's ``SurfaceBCSchedule``
(/root/reference/myapps/convection_diffusion/surface_bc_schedule.{hpp,cpp}):
5- or 7-column `.dat` parsing (t, p_w, rho_e u_e C_H, h_r, [hconv, T_edge],
chemistryOn), piecewise-linear interpolation of the continuous columns and
piecewise-LEFT-constant interpolation of the chemistry toggle (Eval :94-169);
and ``TopTemperatureSchedule`` (ablation_test_case2_1_2D.cpp:196-283).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class BoundaryState:
    p_w: float
    rhoeUeCH: float
    h_r: float
    hconv: float = 0.0
    Tedge: float = 300.0
    has_hconv: bool = False
    has_Tedge: bool = False
    chemistryOn: int = 1


def _bs_flatten(bs: BoundaryState):
    return ((bs.p_w, bs.rhoeUeCH, bs.h_r, bs.hconv, bs.Tedge),
            (bs.has_hconv, bs.has_Tedge, bs.chemistryOn))


def _bs_unflatten(aux, children):
    p_w, rh, hr, hc, te = children
    has_hconv, has_Tedge, chem = aux
    return BoundaryState(p_w, rh, hr, hc, te, has_hconv, has_Tedge, chem)


# Registered as a pytree so jitted residuals can take the continuous fields
# as traced scalars while the chemistry toggle stays static (it changes the
# flux branch, which changes the traced program).
import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(BoundaryState, _bs_flatten, _bs_unflatten)


class SurfaceBCSchedule:
    def __init__(self, rows: np.ndarray, has_hconv: bool):
        """rows: (n, 6) [t, p_w, rhoeUeCH, h_r, hconv, Tedge, chem] packed
        as (n, 7) with hconv/Tedge zero when absent."""
        self.rows = rows
        self.has_hconv = has_hconv

    @classmethod
    def load_file(cls, path: str) -> "SurfaceBCSchedule":
        rows = []
        ncols = 0
        with open(path) as f:
            for ln, line in enumerate(f, 1):
                line = line.split("//")[0]
                parts = line.split()
                if not parts:
                    continue
                try:
                    vals = [float(v) for v in parts]
                except ValueError:
                    raise ValueError(
                        f"Invalid numeric value in surface BC schedule at "
                        f"line {ln}: {path}")
                if len(vals) not in (5, 7):
                    raise ValueError(
                        f"Surface BC schedule line {ln} must have 5 or 7 "
                        f"numeric columns: {path}")
                if ncols == 0:
                    ncols = len(vals)
                elif len(vals) != ncols:
                    raise ValueError(
                        f"Inconsistent surface BC schedule column count at "
                        f"line {ln}: {path}")
                if len(vals) == 5:
                    t, p_w, rh, hr, chem = vals
                    rows.append([t, p_w, rh, hr, 0.0, 300.0, 1.0 if chem >= 0.5 else 0.0])
                else:
                    t, p_w, rh, hr, hc, te, chem = vals
                    rows.append([t, p_w, rh, hr, hc, te, 1.0 if chem >= 0.5 else 0.0])
        if not rows:
            raise ValueError(f"Surface BC schedule has no valid rows: {path}")
        arr = np.asarray(sorted(rows, key=lambda r: r[0]))
        return cls(arr, has_hconv=(ncols == 7))

    def eval(self, t: float) -> BoundaryState:
        r = self.rows
        ts = r[:, 0]
        if t <= ts[0]:
            row = r[0]
            return self._state(row, row)
        if t >= ts[-1]:
            row = r[-1]
            return self._state(row, row)
        # reference scan semantics (surface_bc_schedule.cpp:124-127):
        # hi = FIRST row with rows[hi].t >= time, so at an exact node the
        # left-constant chemistry toggle takes the PRE-node row
        # (side='right' would flip the flux branch one step early)
        hi = int(np.searchsorted(ts, t, side="left"))
        hi = min(max(hi, 1), len(ts) - 1)
        lo = hi - 1
        a, b = r[lo], r[hi]
        dt = b[0] - a[0]
        w = (t - a[0]) / dt if dt > 1e-14 else 0.0
        mix = (1 - w) * a + w * b
        return BoundaryState(
            p_w=float(mix[1]), rhoeUeCH=float(mix[2]), h_r=float(mix[3]),
            hconv=float(mix[4]) if self.has_hconv else 0.0,
            Tedge=float(mix[5]) if self.has_hconv else 300.0,
            has_hconv=self.has_hconv, has_Tedge=self.has_hconv,
            chemistryOn=int(a[6]),  # piecewise-left-constant
        )

    def _state(self, a, b) -> BoundaryState:
        return BoundaryState(
            p_w=float(a[1]), rhoeUeCH=float(a[2]), h_r=float(a[3]),
            hconv=float(a[4]) if self.has_hconv else 0.0,
            Tedge=float(a[5]) if self.has_hconv else 300.0,
            has_hconv=self.has_hconv, has_Tedge=self.has_hconv,
            chemistryOn=int(a[6]),
        )


class TopTemperatureSchedule:
    """(time, temperature) table with piecewise-linear Eval."""

    def __init__(self, times, values):
        self.times = np.asarray(times)
        self.values = np.asarray(values)
        if len(self.times) == 0:
            raise ValueError("Top temperature schedule is empty")

    @classmethod
    def load_file(cls, path: str) -> "TopTemperatureSchedule":
        ts, vs = [], []
        with open(path) as f:
            for ln, line in enumerate(f, 1):
                line = line.split("//")[0]
                parts = line.split()
                if len(parts) < 2:
                    continue
                try:
                    t, v = float(parts[0]), float(parts[1])
                except ValueError as e:
                    raise ValueError(
                        f"Unparseable top temperature schedule row at line "
                        f"{ln}: {path}") from e
                if t < 0:
                    raise ValueError(
                        f"Negative time in top temperature schedule at line "
                        f"{ln}: {path}")
                if ts and t < ts[-1]:
                    raise ValueError(
                        f"Top temperature schedule times must be nondecreasing "
                        f"at line {ln}: {path}")
                ts.append(t)
                vs.append(v)
        if not ts:
            raise ValueError(f"Top temperature schedule is empty: {path}")
        return cls(ts, vs)

    def eval(self, t: float) -> float:
        return float(np.interp(t, self.times, self.values))
