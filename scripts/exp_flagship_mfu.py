"""Honest flagship utilization (VERDICT r3 item 4).

XLA's ``cost_analysis()`` on the flagship ensemble program counts the
scan BODY once instead of x trip count (docs/PERF.md footnote), so the
round-3 roofline left the flagship row "n/a". This script derives the
number analytically instead:

1. FLOPs per CHDriver force evaluation from ``cost_analysis`` of the
   UNSCANNED batched force program (no scan -> no trip-count bug; the
   count is a pure function of the padded tensor shapes, reproduced
   below from first principles as a sanity check);
2. per traj-step FLOPs of the production blocked integrator
   (unconstrained carry-forward: ONE fresh force evaluation per step,
   plus 2 x 3 lead-GEMV bath evaluations and the integrator
   elementwise chain);
3. achieved GFLOP/s and %peak from the bench-measured traj-steps/s.

Run on CPU (counts are shape-only):
    SCLMD_PLATFORM=cpu python scripts/exp_flagship_mfu.py [tsps ...]
tsps defaults to the BENCH_r03 flagship records (18,822 @128 and
25,514 @1024).
"""

import os
import sys

import numpy as np

from sclmd_tpu.utils.platform import select_platform

select_platform()

HERE = os.path.dirname(os.path.abspath(__file__))
NEGF_CACHE = os.path.join(HERE, "flagship_negf.npz")
PEAK_F32 = 49e12          # v5e-class MXU f32, as in exp_roofline.py
PEAK_HBM = 819e9


def main():
    import jax
    import jax.numpy as jnp

    from sclmd_tpu.models.hydrocarbon import CHDriver
    from sclmd_tpu.utils.junction import partition_by_axis

    ck = np.load(NEGF_CACHE)
    axyz = [[str(e)] + list(map(float, p))
            for e, p in zip(ck["els"], ck["pos"])]
    part = partition_by_axis(axyz)
    drv = CHDriver(axyz, dtype=jnp.float32)
    na = len(axyz)
    nph = 3 * na
    x0 = jnp.asarray(np.array([a[1:] for a in axyz], np.float32))

    # ---- 1. measured FLOPs of one batched force evaluation ----
    batch = 128
    xb = jnp.broadcast_to(x0.reshape(-1), (batch, nph)) * 1.0

    f = jax.jit(jax.vmap(drv.force))
    comp = f.lower(xb).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_force = ca.get("flops", float("nan")) / batch
    bytes_force = ca.get("bytes accessed", float("nan")) / batch

    # ---- sanity: first-principles count of the dominant tensor ----
    # Tersoff zeta/angular block is (nc_atoms, nn, nn); with the
    # reverse-mode gradient costing ~2-3x the forward, the measured
    # per-eval FLOPs must sit within a small factor of this
    from sclmd_tpu.models.nnp import build_neighbors
    from sclmd_tpu.models.tersoff import TERSOFF_PARAMS

    els = [a[0] for a in axyz]
    c_ids = [i for i, e in enumerate(els) if e == "C"]
    tp = TERSOFF_PARAMS["C"]
    nbr, mask = build_neighbors(
        np.array([a[1:] for a in axyz])[c_ids], tp["R"] + tp["D"],
        None, skin=0.4)
    nc_atoms, nn = nbr.shape
    # forward: cos_ijk einsum 3*nn^2 MACs/atom, g(theta) ~6 ops,
    # zeta mask+sum ~3, per-pair scalar chain ~30
    fwd_est = nc_atoms * (nn * nn * (2 * 3 + 6 + 3) + nn * 30)
    print(f"atoms: {na} ({len(c_ids)} C), neighbor table nn={nn}")
    print(f"force eval (cost_analysis, batch {batch}): "
          f"{flops_force / 1e6:.3f} MFLOP, {bytes_force / 1e6:.3f} MB")
    print(f"  angular-block forward estimate {fwd_est / 1e6:.3f} MFLOP "
          f"-> grad/forward ratio "
          f"{flops_force / fwd_est:.1f}x (expect ~2-4x)")

    # ---- 2. per traj-step budget of the blocked integrator ----
    ncL, ncR = len(part["ecatsl"]), len(part["ecatsr"])
    # Markovian ebath force: efric GEMV (2 nc^2) + noise add; evaluated
    # 3x per step (predictor + two correctors)
    flops_bath = 3 * 2 * (ncL ** 2 + ncR ** 2)
    # integrator elementwise: ~12 vector ops over nph per step + 2
    # current dots
    flops_integ = 12 * nph + 2 * 2 * (ncL + ncR)
    per_step = flops_force + flops_bath + flops_integ
    print(f"per traj-step: force {flops_force / 1e6:.3f} M + bath "
          f"{flops_bath / 1e3:.1f} k + integrator "
          f"{flops_integ / 1e3:.1f} k = {per_step / 1e6:.3f} MFLOP")

    # ---- 3. achieved rates ----
    tsps_list = [float(a) for a in sys.argv[1:]] or [18822.0, 25514.0]
    for tsps in tsps_list:
        gfs = per_step * tsps / 1e9
        print(f"tsps={tsps:,.0f}: {gfs:,.1f} GFLOP/s = "
              f"{100 * gfs * 1e9 / PEAK_F32:.2f}% of f32 peak; "
              f"roofline floor from force-eval bytes: "
              f"{bytes_force * tsps / 1e9:,.1f} GB/s = "
              f"{100 * bytes_force * tsps / PEAK_HBM:.2f}% of HBM "
              f"(bytes are per-program fusion-dependent — indicative)")


if __name__ == "__main__":
    main()
