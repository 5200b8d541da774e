"""Headline benchmark: matrix-free operator apply MDOF/s + CG wall-clock.

Problem: 3D convection-diffusion, order-2/3/4 hexes, matrix-free partial
assembly (BASELINE.json metric).  Prints the headline JSON line
  {"metric": ..., "value": MDOF/s, "unit": "MDOF/s", "vs_baseline": v/500,
   ...}
TWICE: once as soon as the first order's section completes (so a
driver-side timeout can never lose the artifact — VERDICT r2 weak #1), and
once enriched at the end with the remaining sections.  The driver parses
whichever line survives; both are valid headline records.
vs_baseline is against the north-star target of 500 MDOF/s on one v5e chip.
Every number published in README/PARITY comes from this artifact (captured
as BENCH_r{N}.json by the driver) — no hand-carried numbers.

Self-imposed wall-clock budget: BENCH_DEADLINE_S (default 900 s).  Sections
that do not fit are skipped with a note in the JSON ("skipped" list) so the
run always exits 0 well inside the driver's timeout.

Timing protocol (VERDICT r2 weak #2): every path is timed as the median of
BENCH_REPS (default 5) jitted 50-iteration loops; the JSON carries
{median, iqr, n} per best path.

Roofline (VERDICT r2 weak #3): per path we model the minimum HBM traffic of
one apply (read coefficient tensor D + read u + write y) and its FLOPs, and
report achieved GB/s as a % of the chip's HBM bandwidth (BENCH_HBM_GBPS,
default 819 for v5e) plus arithmetic intensity.

Sections (each guarded; a failure degrades to stderr, never kills the run):
  orders   : operator-apply sweep over BENCH_ORDERS (default 2,3,4)
  mg       : SPD (mass+diffusion) CG preconditioned by geometric multigrid
             vs Jacobi (the production use of solvers/multigrid.py — the
             reference's petsc*.opts PC analog)
  ablation : wall-clock of one f32 coupled (T,p) ablation Newton step
             (residual + AD Jacobian + equilibrated block GMRES) on this
             chip — the flagship physics TPU-resident (VERDICT r1 #2)
  blocksolve_refinement : GMRES cycle/iteration growth of the MUMPS
             replacement under strip refinement (VERDICT r2 weak #4);
             opt-in via BENCH_BLOCKSOLVE=1 (it is also a pytest)
"""

import json
import os
import sys
import time

os.environ["CMFEM_X64"] = "0"

import numpy as np


ITERS = 50
REPS = int(os.environ.get("BENCH_REPS", "5"))
HBM_GBPS = float(os.environ.get("BENCH_HBM_GBPS", "819"))
# v5e bf16 MXU peak; f32 throughput is lower, so %peak is a loose bound
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
_DEADLINE = time.monotonic() + float(os.environ.get("BENCH_DEADLINE_S",
                                                    "900"))


def time_left():
    return _DEADLINE - time.monotonic()


def make_loop(jax, jnp, fn):
    """Time a fully-jitted loop of applies: per-call dispatch through the
    axon relay is ~60ms, so eager ops between applies would swamp the
    measurement.  The feedback term defeats CSE/hoisting without a global
    reduce — the r2 protocol's max-normalization added a full extra pass
    over y per apply (measured: order-2 CG at 1787 MDOF/s vs the "bare"
    apply loop at 1013), understating every apply number.  The constant
    damping keeps values finite over 50 chained applies."""

    @jax.jit
    def many(u, *extra):
        def body(_, u):
            y = fn(u, *extra)
            return 0.25 * y + 1e-30 * u

        return jax.lax.fori_loop(0, ITERS, body, u)

    return many


def timeit(jax, many, u, *extra):
    """Median over REPS timed loops (after one warm-up/compile loop).
    Returns (median_s, iqr_s) per single apply."""
    y = many(u, *extra)
    jax.block_until_ready(y)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        y = many(u, *extra)
        jax.block_until_ready(y)
        ts.append((time.perf_counter() - t0) / ITERS)
    ts = np.sort(np.asarray(ts))
    med = float(np.median(ts))
    iqr = float(np.percentile(ts, 75) - np.percentile(ts, 25))
    return med, iqr


def bench_operator(jax, jnp, n, order, platform, run_cg=True):
    """Best-path operator-apply MDOF/s at one order; returns a result dict
    and (when run_cg) the CG-measured throughput."""
    from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
    from cmfem_tpu.ops import SpaceOps, BilinearForm
    from cmfem_tpu.ops.partial import (
        PAOperator, StructuredGrid3D, StructuredPAOperator,
    )
    from cmfem_tpu.ops.sumfact import SumFactoredOperator
    from cmfem_tpu.solvers import cg, jacobi_preconditioner

    t0 = time.perf_counter()
    mesh = make_cartesian_mesh_3d(n, n, n)
    fes = FESpace(mesh, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    kappa = 0.1
    beta = np.array([1.0, -2.0, 0.5])
    form = (BilinearForm(ops)
            .add_diffusion(kappa)
            .add_convection(beta)
            .add_mass(1.0))
    data = form.assemble()
    grid = StructuredGrid3D(n, n, n, order)
    ndofs = fes.nscalar
    assert grid.ndofs == ndofs
    setup_s = time.perf_counter() - t0

    sfop = SumFactoredOperator(ops, data, n, n, n, order)
    candidates = [("sumfact", lambda: sfop.bind())]
    if sfop.z_periodic and sfop.compressed:
        candidates.append(("sumfact-periodic",
                           lambda: sfop.bind(use_periodic=True)))
    if platform == "tpu" and sfop.compressed:
        # whole-operator fusion: one kernel per y-element slab; the
        # non-periodic variant streams this slab's full D planes through
        # VMEM, so gate it on the slab size (double-buffered)
        # measured cutoff on v5e: a 5.1MB slab (order 4, n=32) compiles,
        # 5.9MB (order 3, n=48) exhausts VMEM with the double buffer
        d_slab = sfop.D.shape[0] * sfop.Kz * sfop.q1 * sfop.Kx * 4
        if d_slab <= 5_300_000:
            candidates.append(("sumfact-fused",
                               lambda: sfop.bind(use_fused=True)))
        elif sfop.Kx % 2 == 0 and d_slab <= 2 * 5_300_000:
            # D slab exceeds VMEM: stream it in 2 x-column chunks
            # (sequential accumulating grid dim)
            candidates.append(("sumfact-fused-xc2",
                               lambda: sfop.bind(use_fused=True,
                                                 x_chunks=2)))
        # 2-element slabs double every VMEM footprint for wider matmuls
        fields2 = 14 * sfop.NZ * 2 * sfop.q1 * sfop.Kx * 4
        if n % 2 == 0 and 2 * d_slab <= 5_300_000 and fields2 <= 12_000_000:
            candidates.append(("sumfact-fused-s2",
                               lambda: sfop.bind(use_fused=True, slab=2)))
        if d_slab <= 2_600_000:
            # FMA z-stage variant: z matmuls become unrolled FMAs (the
            # dense z contraction wastes NZ/(p+1) of its flops on the
            # block-banded 1D basis).  Tighter gate than the plain fused
            # kernel: the unrolled z stage keeps ~4x more live VMEM
            # (measured: 5.1MB D slab -> 22.9M scoped vmem OOM at order 4,
            # while 2.5MB at order 2 compiles)
            candidates.append(("sumfact-zfma",
                               lambda: sfop.bind(use_fused=True,
                                                 z_fma=True)))
        # (x-chunked zfma measured slower than x-chunked plain fused at
        # orders 3-4 non-periodic — 1080 vs 1286 MDOF/s — so only the
        # plain fused kernel gets an xc candidate above)
        if sfop.z_periodic:
            candidates.append(
                ("sumfact-fused-periodic",
                 lambda: sfop.bind(use_fused=True, use_periodic=True)))
            candidates.append(
                ("sumfact-zfma-periodic",
                 lambda: sfop.bind(use_fused=True, use_periodic=True,
                                   z_fma=True)))
            fields4 = 14 * sfop.NZ * 4 * sfop.q1 * sfop.Kx * 4
            if n % 4 == 0 and fields4 <= 12_000_000:
                candidates.append(
                    ("sumfact-fused-periodic-s4",
                     lambda: sfop.bind(use_fused=True, use_periodic=True,
                                       slab=4)))
            # zfma x slab: wider x/y matmuls on top of the FMA z stage
            # (the order-2 winner's two levers composed); same ~4x live
            # VMEM of zfma, so gate on half the plain-slab budgets
            fields2 = 14 * sfop.NZ * 2 * sfop.q1 * sfop.Kx * 4
            if n % 2 == 0 and fields2 <= 6_000_000:
                candidates.append(
                    ("sumfact-zfma-periodic-s2",
                     lambda: sfop.bind(use_fused=True, use_periodic=True,
                                       z_fma=True, slab=2)))
            if n % 4 == 0 and fields4 <= 6_000_000:
                candidates.append(
                    ("sumfact-zfma-periodic-s4",
                     lambda: sfop.bind(use_fused=True, use_periodic=True,
                                       z_fma=True, slab=4)))
    KK = sfop.Ky * sfop.Kx
    if platform == "tpu" and sfop.compressed and KK % 256 == 0:
        candidates.append(("sumfact-pallas",
                           lambda: sfop.bind(use_pallas=True, tile=256)))
        if sfop.z_periodic:
            candidates.append(
                ("sumfact-pallas-periodic",
                 lambda: sfop.bind(use_pallas=True, tile=256,
                                   use_periodic=True)))
    all_paths = os.environ.get("BENCH_ALL_PATHS", "0") == "1"
    if all_paths:
        candidates.append(("structured-xla",
                           lambda: StructuredPAOperator(ops, data, grid,
                                                        use_pallas=False).bind()))
        if platform == "tpu":
            candidates.append(("structured-pallas",
                               lambda: StructuredPAOperator(ops, data, grid,
                                                            use_pallas=True).bind()))
        candidates.append(("unstructured-xla",
                           lambda: PAOperator(ops, data).bind()))
    elif platform == "tpu":
        # trimmed default sweep: compiles dominate the bench wall-clock on
        # this box (VERDICT r2 weak #1 — the full sweep blew the driver's
        # timeout), and rounds 1-2 established the ranking.  Keep the
        # baseline, the best-known fused variant of each periodicity, and
        # the const-D variants; BENCH_ALL_PATHS=1 restores the full sweep.
        prefer = ["sumfact"]
        for group in (("sumfact-zfma", "sumfact-fused", "sumfact-fused-s2",
                       "sumfact-fused-xc2"),
                      ("sumfact-zfma-periodic", "sumfact-fused-periodic",
                       "sumfact-fused-periodic-s4"),
                      ("sumfact-zfma-periodic-s2",),
                      ("sumfact-zfma-periodic-s4",),
                      ("sumfact-zfma-const", "sumfact-fused-const")):
            for name in group:
                if any(c[0] == name for c in candidates):
                    prefer.append(name)
                    break
        candidates = [c for c in candidates if c[0] in prefer]

    # minimum-HBM-traffic roofline model per path (VERDICT r2 weak #3):
    # one apply must read the coefficient tensor (full D, or the z-
    # compressed Dz for *-periodic paths, or nothing for *-const paths)
    # plus the input vector, and write the output vector.  Intermediate
    # tensors are modeled as VMEM-resident (XLA fusion/Pallas achieve
    # this), so pct_of_bw_roofline is a lower bound on the true fraction
    # of HBM bandwidth used.
    mm = sfop.D.shape[0]
    isz = sfop.D.dtype.itemsize
    K = sfop.Kz * sfop.Ky * sfop.Kx
    d_bytes_full = mm * K * isz
    d_bytes_periodic = (mm * sfop.q1 * sfop.Ky * sfop.Kx * isz
                        if sfop.z_periodic else d_bytes_full)
    uv_bytes = 2 * ndofs * 4

    def min_bytes(name):
        if "const" in name:
            return uv_bytes
        if "periodic" in name:
            return d_bytes_periodic + uv_bytes
        return d_bytes_full + uv_bytes

    # FLOP estimate (documented ±20%): pointwise D application (2 flops
    # per channel per quad point) + sum-factorized basis contractions.
    # Forward: x-stage produces 2 fields (v, v_x), y-stage 4, z-stage 6;
    # the transpose pass mirrors it.  Each 1D contraction is 2*p1 flops
    # per output point.
    p1 = order + 1
    q1 = sfop.q1
    NX, NY, NZ = sfop.NX, sfop.NY, sfop.NZ
    contr = 2 * p1 * (2 * sfop.Kx * NY * NZ
                      + 4 * sfop.Kx * sfop.Ky * NZ
                      + 6 * K)
    flops_apply = 2 * mm * K + 2 * contr

    results = {}
    stats = {}
    best_bound = None
    u0 = jnp.ones(ndofs, dtype=jnp.float32)
    for name, make_bound in candidates:
        try:
            bound = make_bound()
            fn, extra = bound[0], bound[1:]
            many = make_loop(jax, jnp, fn)
            dt, iqr = timeit(jax, many, u0, *extra)
            results[name] = ndofs / dt / 1e6
            gbps = min_bytes(name) / dt / 1e9
            stats[name] = {
                "mdofs": round(results[name], 1),
                "iqr_pct": round(100.0 * iqr / dt, 1),
                "n_reps": REPS,
                "min_GB_per_apply": round(min_bytes(name) / 1e9, 4),
                "pct_of_bw_roofline": round(100.0 * gbps / HBM_GBPS, 1),
                "gflops": round(flops_apply / dt / 1e9, 1),
                "pct_of_bf16_peak": round(
                    100.0 * flops_apply / dt / (PEAK_TFLOPS * 1e12), 2),
                "intensity_flops_per_byte": round(
                    flops_apply / min_bytes(name), 2),
            }
            if results[name] >= max(results.values()):
                best_bound = (fn, extra)
        except Exception as e:  # pragma: no cover
            print(f"# order={order} {name} path failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
    best_name = max(results, key=results.get)
    mdofs = results[best_name]

    out = {"n": n, "ndofs": ndofs, "paths": {k: round(v, 1)
                                             for k, v in results.items()},
           "roofline": stats,
           "best": best_name, "apply_mdofs": round(mdofs, 1),
           "apply_iqr_pct": stats.get(best_name, {}).get("iqr_pct"),
           "setup_s": round(setup_s, 1)}
    if not run_cg:
        return out

    # CG wall-clock through the best operator
    diag = form.assemble_diagonal(data).astype(jnp.float32)
    pos_f = np.round(np.asarray(fes.node_positions)
                     * (grid.NX - 1)).astype(np.int64)
    lattice_idx = (pos_f[:, 2] * grid.NY + pos_f[:, 1]) * grid.NX \
        + pos_f[:, 0]
    diag_lat = jnp.zeros(ndofs, jnp.float32).at[lattice_idx].set(diag)
    b = jnp.ones(ndofs, dtype=jnp.float32)
    fn_best, extra_best = best_bound

    @jax.jit
    def solve(b, diag_lat, *extra):
        M = jacobi_preconditioner(diag_lat)
        return cg(lambda v: fn_best(v, *extra), b, M=M, rtol=1e-5,
                  maxiter=200)

    r = solve(b, diag_lat, *extra_best)
    jax.block_until_ready(r.x)
    t0 = time.perf_counter()
    r = solve(b, diag_lat, *extra_best)
    jax.block_until_ready(r.x)
    cg_s = time.perf_counter() - t0
    cg_mdofs = ndofs * max(int(r.iters), 1) / cg_s / 1e6
    out["cg_iters"] = int(r.iters)
    out["cg_s"] = round(cg_s, 3)
    out["cg_mdofs"] = round(cg_mdofs, 1)
    # solve outcome (VERDICT r4 #5): cg_mdofs is a throughput number
    # either way, but the artifact must say whether the rtol-1e-5 solve
    # actually finished or ran into the 200-iteration cap
    out["cg_converged"] = bool(r.converged)
    out["cg_stagnated"] = bool(r.stagnated)
    out["cg_rel_residual"] = float(r.rel_residual)
    out["cg_hit_maxiter"] = bool(int(r.iters) >= 200
                                 and not bool(r.converged))
    return out


def bench_mg(jax, jnp, n, order):
    """SPD (mass + diffusion) solve: MG-preconditioned CG vs Jacobi-CG —
    solvers/multigrid.py in its production role (reference petsc*.opts
    PC analog)."""
    from cmfem_tpu.ops import BilinearForm
    from cmfem_tpu.solvers import cg, jacobi_preconditioner
    from cmfem_tpu.solvers.multigrid import StructuredMG

    def make_form(ops):
        # pure diffusion with Dirichlet walls — the Poisson-like solve the
        # reference's AMG option files target; a mass-dominated operator
        # would hand Jacobi an artificially easy conditioning story
        return BilinearForm(ops).add_diffusion(1.0)

    mg = StructuredMG.build(n, order, make_form)
    lvl0 = mg.levels[0]
    fn0, D0 = lvl0["op"].best_bind()
    mask0 = lvl0["mask"]
    diag0 = lvl0["diag"]
    Mmg, arrs = mg.bind()
    ndofs = int(diag0.shape[0])

    def apply_A(v, D):
        av = fn0(jnp.where(mask0, 0.0, v), D)
        return jnp.where(mask0, v, av)

    b = jnp.ones(ndofs, jnp.float32)

    @jax.jit
    def solve_mg(b, D, arrs):
        return cg(lambda v: apply_A(v, D), b,
                  M=lambda r: Mmg(r, arrs), rtol=1e-8, maxiter=200)

    @jax.jit
    def solve_jac(b, D, diag):
        return cg(lambda v: apply_A(v, D), b,
                  M=jacobi_preconditioner(diag), rtol=1e-8, maxiter=2000)

    out = {"n": n, "order": order, "ndofs": ndofs}
    for name, fn, args in (("mg", solve_mg, (b, D0, arrs)),
                           ("jacobi", solve_jac, (b, D0, diag0))):
        r = fn(*args)
        jax.block_until_ready(r.x)
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r.x)
        out[f"{name}_iters"] = int(r.iters)
        out[f"{name}_s"] = round(time.perf_counter() - t0, 4)
        # rtol 1e-8 targets the f64 regime; on the f32 chip cg's
        # true-residual stopping reports stagnated-at-floor instead of
        # converged.  Both are a finished solve here, but they are
        # DISTINCT outcomes and recorded separately (ADVICE r4 #2); the
        # rel_residual shows WHERE the solve stopped either way.
        out[f"{name}_converged"] = bool(r.converged)
        out[f"{name}_stagnated"] = bool(r.stagnated)
        out[f"{name}_rel_residual"] = float(r.rel_residual)
    out["speedup_vs_jacobi"] = round(out["jacobi_s"] / out["mg_s"], 2)
    return out


def bench_ablation(jax, jnp, nx, ny):
    """One f32 coupled (T,p) ablation Newton step on this chip: jitted
    residual + AD element-Jacobian/equilibration prepare + point-block
    GMRES solve (the MUMPS-replacement path, solvers/blocksolve.py).
    The flagship physics of the suite running TPU-resident."""
    from cmfem_tpu.core import FESpace, make_cartesian_mesh_2d
    from cmfem_tpu.ops import SpaceOps
    from cmfem_tpu.physics.tacot import TacotMaterial
    from cmfem_tpu.physics.ablation import AblationSystem, AblationState
    from cmfem_tpu.solvers import BlockNewtonKrylov

    REF = "/root/reference/myapps/convection_diffusion"
    mesh = make_cartesian_mesh_2d(nx, ny, sx=0.0025, sy=0.05)
    mat = TacotMaterial.load_yaml(f"{REF}/Input/material_tacot_case1.yaml")
    fes = FESpace(mesh, 1)
    n = fes.nscalar
    ops = SpaceOps(fes, quad_order=4)
    sys_ = AblationSystem(ops, mat, top_attr=3)
    state = AblationState.initial(sys_.ne, sys_.nq, mat)
    ess = np.asarray(fes.boundary_dofs([3]))
    dt = 0.05
    T = jnp.full(n, 300.0).at[jnp.asarray(ess)].set(1644.0)
    p = jnp.full(n, 101325.0)
    T_old_q = ops.values_at_qp(jnp.full(n, 300.0))
    p_old_q = ops.values_at_qp(p)
    X_old = state.extent
    mask2 = np.zeros(2 * n, dtype=bool)
    mask2[ess] = True
    mask2[ess + n] = True
    mask2_j = jnp.asarray(mask2)
    from cmfem_tpu.solvers.blocksolve import strip_dof_lattice
    lat = strip_dof_lattice(fes.node_positions)
    sys_.set_dof_lattice(lat)   # window-slicing residual (no gather/segsum)
    bks = BlockNewtonKrylov(fes.element_dofs, n, ess, ess, restart=150,
                            maxiter=10, dof_lattice=lat)

    @jax.jit
    def residual(T, p):
        RT, Rp = sys_.residual(T, p, T_old_q, p_old_q, X_old, dt)
        return jnp.where(mask2_j, 0.0, jnp.concatenate([RT, Rp]))

    @jax.jit
    def jac_blocks(T, p):
        return sys_.element_jacobians(T, p, T_old_q, p_old_q, X_old, dt)

    def step(T, p):
        R = residual(T, p)
        fac = bks.prepare(jac_blocks(T, p))
        res = bks.solve(fac, -R, rtol=1e-4)
        return T + res.x[:n], p + res.x[n:], R, res

    # warm up (compiles) and check the Newton direction actually reduces
    # the residual
    T1, p1, R0, res0 = step(T, p)
    jax.block_until_ready(T1)
    rnorm0 = float(jnp.linalg.norm(R0))
    rnorm1 = float(jnp.linalg.norm(residual(*step(T1, p1)[:2])))

    # Phase timings are feedback-chained fori_loops inside ONE jit:
    # a single eager call measures mostly the axon relay's ~30 ms
    # dispatch latency, not the device (measured 33 ms eager vs ~1.4 ms
    # amortized for the same residual), and a loop without the feedback
    # term is loop-invariant, so XLA hoists the body and times nothing.
    # The production drivers amortize dispatch the same way (scan paths).
    REPS = 20

    def loop_ms(many, *args):
        r = many(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = many(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / REPS * 1e3

    @jax.jit
    def many_res(T, p):
        def body(_, c):
            T, p = c
            RT_Rp = residual(T, p)
            return (T + 1e-30 * RT_Rp[:n], p + 1e-30 * RT_Rp[n:])
        return jax.lax.fori_loop(0, REPS, body, (T, p))

    @jax.jit
    def many_prep(T, p):
        def body(_, c):
            T, p = c
            fac = bks._prepare_impl(*jac_blocks(T, p))
            s = jnp.sum(fac[2]) * 1e-30
            return (T + s, p + s)
        return jax.lax.fori_loop(0, REPS, body, (T, p))

    fac0 = bks.prepare(jac_blocks(T1, p1))
    R1 = residual(T1, p1)

    @jax.jit
    def many_solve(fac, R):
        def body(_, R):
            res = bks.solve(fac, -R, rtol=1e-4)
            return R + 1e-30 * res.x
        return jax.lax.fori_loop(0, REPS, body, R)

    t_res = loop_ms(many_res, T1, p1)
    t_prep = loop_ms(many_prep, T1, p1)
    t_solve = loop_ms(many_solve, fac0, R1)
    res = bks.solve(fac0, -R1, rtol=1e-4)
    out = {"ne": sys_.ne, "ndofs_tp": 2 * n,
           "residual_ms": round(t_res, 2),
           "prepare_ms": round(t_prep, 2),
           "solve_ms": round(t_solve, 2),
           "newton_step_ms": round(t_res + t_prep + t_solve, 2),
           "timing": f"device time amortized over {REPS} chained "
                     "in-jit iterations (the scan drivers' regime)",
           "gmres_cycles": int(res.iters),
           "R0": rnorm0, "R_after_2_steps": rnorm1,
           "residual_reduction_ok": bool(rnorm1 < rnorm0)}

    # h-robust line-MG PC (solvers/linemg.py) on the same system
    try:
        bks_mg = BlockNewtonKrylov(fes.element_dofs, n, ess, ess,
                                   restart=60, maxiter=5,
                                   dof_lattice=lat, pc="linemg")

        @jax.jit
        def many_prep_mg(T, p):
            def body(_, c):
                T, p = c
                fac = bks_mg._prepare_impl(*jac_blocks(T, p))
                s = jnp.sum(fac[2]) * 1e-30
                return (T + s, p + s)
            return jax.lax.fori_loop(0, REPS, body, (T, p))

        fac_mg = bks_mg.prepare(jac_blocks(T1, p1))

        @jax.jit
        def many_solve_mg(fac, R):
            def body(_, R):
                res = bks_mg.solve(fac, -R, rtol=1e-4)
                return R + 1e-30 * res.x
            return jax.lax.fori_loop(0, REPS, body, R)

        res_mg = bks_mg.solve(fac_mg, -R1, rtol=1e-4)
        out["linemg_prepare_ms"] = round(loop_ms(many_prep_mg, T1, p1), 2)
        out["linemg_solve_ms"] = round(loop_ms(many_solve_mg, fac_mg,
                                               R1), 2)
        out["linemg_inner_iters"] = int(res_mg.inner_iters)
        out["linemg_converged"] = bool(res_mg.converged)
    except Exception as e:  # pragma: no cover
        out["linemg_failed"] = f"{type(e).__name__}: {e}"
    return out


def main():
    if os.environ.get("CMFEM_FORCE_CPU", "0") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # persistent compile cache: remote (tunneled) compiles are ~1-3 min
    # per program and dominate a cold bench run; a warm cache fits the
    # whole sweep comfortably inside the default deadline
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    except Exception as e:  # pragma: no cover
        print(f"# compile cache unavailable: {e}", file=sys.stderr)

    platform = jax.devices()[0].platform
    n = int(os.environ.get("BENCH_N", "48"))
    orders = [int(o) for o in
              os.environ.get("BENCH_ORDERS", "2,3,4").split(",")]

    order_results = {}
    skipped = []
    headline = 0.0
    headline_desc = ""

    def headline_json(**extra):
        """One SHORT machine-readable line for the driver.

        The driver parses the last stdout line and stores only a bounded
        tail (round-3 lesson: embedding the full per-order roofline data
        made the line longer than the captured tail -> `parsed: null`).
        The rich payload goes to `artifacts_bench_local.json` + stderr.
        """
        rich = {
            "metric": f"operator-apply MDOF/s (3D CDR, {headline_desc})",
            "value": round(headline, 1),
            "unit": "MDOF/s",
            "vs_baseline": round(headline / 500.0, 3),
            "timing": f"median of {REPS} jitted {ITERS}-apply loops",
            "platform": platform,
            "orders": order_results,
            **extra,
        }
        try:
            out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "artifacts_bench_local.json")
            with open(out, "w") as f:
                json.dump(rich, f, indent=1)
        except OSError as e:  # pragma: no cover
            print(f"# could not write artifacts_bench_local.json: {e}",
                  file=sys.stderr)
        print(f"# rich: {json.dumps(rich)}", file=sys.stderr)
        short = {
            "metric": f"operator-apply MDOF/s (3D CDR, {headline_desc})",
            "value": round(headline, 1),
            "unit": "MDOF/s",
            "vs_baseline": round(headline / 500.0, 3),
            "platform": platform,
        }
        if extra.get("partial"):
            short["partial"] = True
        if extra.get("skipped"):
            short["skipped"] = extra["skipped"]
        return json.dumps(short)

    def run_order(order, first):
        nonlocal headline, headline_desc
        # order 4 at n=48 is 7.2M dofs with a 5^3-point rule; shrink the
        # mesh to keep the D arrays comfortably inside HBM.  Use 2n/3
        # rounded to a multiple of 16 so Ky*Kx stays 256-divisible and the
        # fused Pallas paths stay eligible (q1=5: KK=25 n^2).
        n_o = n if order < 4 else max(16, (2 * n // 3) // 16 * 16)
        try:
            r = bench_operator(jax, jnp, n_o, order, platform,
                               run_cg=first)
            order_results[str(order)] = r
            val = max(r["apply_mdofs"], r.get("cg_mdofs", 0.0))
            print(f"# order={order} {r}", file=sys.stderr)
            if val > headline:
                headline = val
                src = ("CG" if r.get("cg_mdofs", 0.0) >= r["apply_mdofs"]
                       else r["best"])
                headline_desc = (f"order-{order} hex, sum-factorized "
                                 f"matrix-free, measured through {src}")
        except Exception as e:  # pragma: no cover
            print(f"# order={order} sweep failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # headline (first-order) section first and printed immediately, then
    # the REMAINING ORDERS (VERDICT r4 #3: round 4 deferred them after
    # mg/ablation and the deadline skipped orders 3-4 entirely — the
    # roofline rows are primary evidence, the mg/ablation sections are
    # the optional extras), then mg/ablation.
    run_order(orders[0], True)
    if headline > 0:
        # print the headline record NOW: if anything downstream dies
        # or the driver's timeout fires, this line is the artifact
        print(headline_json(partial=True))
        sys.stdout.flush()

    for order in orders[1:]:
        if time_left() < 120:
            skipped.append(f"order-{order}")
            continue
        run_order(order, False)

    mg_results = {}
    if time_left() < 150:
        skipped.append("mg")
    else:
        try:
            mg_results = bench_mg(jax, jnp, min(n, 48), 2)
            print(f"# mg {mg_results}", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"# mg section failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    abl_results = {}
    if time_left() < 150:
        skipped.append("ablation")
    else:
        try:
            abl_results = bench_ablation(
                jax, jnp,
                int(os.environ.get("BENCH_ABL_NX", "32")),
                int(os.environ.get("BENCH_ABL_NY", "512")))
            print(f"# ablation {abl_results}", file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"# ablation section failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    bsr_results = {}
    if os.environ.get("BENCH_BLOCKSOLVE", "0") == "1":
        if time_left() < 200:
            skipped.append("blocksolve_refinement")
        else:
            try:
                sys.path.insert(0, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "scripts"))
                from blocksolve_refinement import run_study

                bsr_results = run_study()
                print(f"# blocksolve_refinement {bsr_results}",
                      file=sys.stderr)
            except Exception as e:  # pragma: no cover
                print(f"# blocksolve_refinement failed: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)

    print(headline_json(mg=mg_results, ablation=abl_results,
                        blocksolve_refinement=bsr_results,
                        skipped=skipped))


if __name__ == "__main__":
    main()
