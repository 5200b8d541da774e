"""General-coefficient operator-apply experiments (VERDICT r4 #4).

The round-4 headline leaned on the z-periodic compressed-D path; the
number that transfers to variable-coefficient problems is the
NON-periodic (full-D) apply, measured at 860 MDOF/s (sumfact-zfma,
order 2) — 14.6% of the HBM roofline, so the kernel is compute/issue
bound, not bandwidth bound.  This script measures every non-periodic
order-2 variant head-to-head on the chip (the round-4 bench's trimmed
sweep only ran zfma at order 2, while at orders 3-4 the PLAIN fused
kernel with dense z matmuls beat the FMA-z variant 1286 vs 1080):

  sumfact            global-matmul baseline
  sumfact-fused      slab kernel, dense z matmuls (MXU)
  sumfact-fused-s2   2-element slabs (wider matmuls)
  sumfact-zfma       slab kernel, unrolled FMA z stages (VPU)

plus CG through the best path.  Writes artifacts_apply_experiments.json
for the roofline analysis committed in docs/apply_roofline.md.

Usage (on the TPU): python scripts/apply_experiments.py
"""

import json
import os
import sys
import time

os.environ.setdefault("CMFEM_X64", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

ITERS = 50
REPS = 5
HBM_GBPS = 819.0


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from cmfem_tpu.core import FESpace, make_cartesian_mesh_3d
    from cmfem_tpu.ops import SpaceOps, BilinearForm
    from cmfem_tpu.ops.sumfact import SumFactoredOperator

    sys.path.insert(0, os.path.join(REPO))
    from bench import make_loop, timeit

    n = int(os.environ.get("APPLY_N", "48"))
    order = int(os.environ.get("APPLY_ORDER", "2"))
    mesh = make_cartesian_mesh_3d(n, n, n)
    fes = FESpace(mesh, order)
    ops = SpaceOps(fes, quad_order=2 * order)
    form = (BilinearForm(ops).add_diffusion(0.1)
            .add_convection(np.array([1.0, -2.0, 0.5])).add_mass(1.0))
    data = form.assemble()
    sfop = SumFactoredOperator(ops, data, n, n, n, order)
    ndofs = fes.nscalar
    mm = sfop.D.shape[0]
    K = sfop.Kz * sfop.Ky * sfop.Kx
    min_bytes = (mm * K + 2 * ndofs) * 4

    candidates = [
        ("sumfact", lambda: sfop.bind()),
        ("sumfact-fused", lambda: sfop.bind(use_fused=True)),
        ("sumfact-zfma", lambda: sfop.bind(use_fused=True, z_fma=True)),
    ]
    if n % 2 == 0:
        candidates.append(("sumfact-fused-s2",
                           lambda: sfop.bind(use_fused=True, slab=2)))
        candidates.append(("sumfact-zfma-xc2",
                           lambda: sfop.bind(use_fused=True, z_fma=True,
                                             x_chunks=2)))

    out = {"n": n, "order": order, "ndofs": ndofs,
           "platform": jax.devices()[0].platform,
           "min_GB_per_apply": round(min_bytes / 1e9, 4),
           "paths": {}}
    u0 = jnp.ones(ndofs, jnp.float32)
    for name, mk in candidates:
        try:
            bound = mk()
            fn, extra = bound[0], bound[1:]
            many = make_loop(jax, jnp, fn)
            dt, iqr = timeit(jax, many, u0, *extra)
            gbps = min_bytes / dt / 1e9
            out["paths"][name] = {
                "mdofs": round(ndofs / dt / 1e6, 1),
                "iqr_pct": round(100 * iqr / dt, 1),
                "pct_of_bw_roofline": round(100 * gbps / HBM_GBPS, 1),
                "us_per_apply": round(dt * 1e6, 1),
            }
            print(f"# {name}: {out['paths'][name]}", file=sys.stderr)
        except Exception as e:
            out["paths"][name] = {"failed": f"{type(e).__name__}: {e}"}
            print(f"# {name} failed: {e}", file=sys.stderr)

    path = os.path.join(REPO, "artifacts_apply_experiments.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
