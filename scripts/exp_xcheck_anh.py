"""Anharmonic QUANTUM flagship conductance via the harmonic-twin
control variate (VERDICT r3 item 1 — the production observable).

The reference's actual validation configuration is anharmonic MD vs
harmonic NEGF (ref examples/runmd.py:27 REBO forces vs
examples/runnegf.py:17-28). Round 3 could bound the anharmonic
correction only in the CLASSICAL limit (~3%) because the plain
antithetic estimator decorrelates under anharmonicity (SEM 145%).
This script measures the QUANTUM correction with
parallel.ensemble.harmonic_twin_delta: anharmonic and harmonic twins
share noise keys and warm-started initial states, so

    kappa_anh = mean(J_anh - J_harm) + kappa_exact

with only the anharmonic delta's own noise in the SEM. kappa_exact is
the zero-Monte-Carlo attractor theory (scripts/exp_xcheck_exact.py
cache; falls back to the NEGF Landauer value with a warning).

    python scripts/exp_xcheck_anh.py [--ntraj N] [--nmd LOG2N]
        [--seed S] [--equil F]
"""

import os
import sys
import time

import numpy as np

from sclmd_tpu.utils.platform import select_platform

select_platform()

HERE = os.path.dirname(os.path.abspath(__file__))
NEGF_CACHE = os.path.join(HERE, "flagship_negf.npz")

T, DELTA = 300.0, 0.1
DT = 0.25 / 0.658
DAMP_NAT = 100 / 0.658211814201041


def builders(axyz, part, dyn, nmd, seed):
    import tempfile

    import jax.numpy as jnp

    from sclmd_tpu import baths as B
    from sclmd_tpu.md import md as MDRunner
    from sclmd_tpu.models.hydrocarbon import CHDriver

    drv = CHDriver(axyz, dtype=jnp.float32)

    def base(Ta, Tb):
        runner = MDRunner(DT, nmd, T, axyz=axyz, dyn=dyn,
                          dtype=jnp.float32, seed=seed,
                          outdir=tempfile.mkdtemp(prefix="anh_"))
        for cats, tt in ((part["ecatsl"], Ta), (part["ecatsr"], Tb)):
            eta = (1.0 / DAMP_NAT) * np.identity(len(cats))
            runner.AddBath(B.ebath(cats, tt, runner.dt, runner.nmd,
                                   wmax=1.0, nw=500, efric=eta))
        runner.AddConstr([part["fixdofs"]])
        return runner

    def build_anh(Ta, Tb):
        r = base(Ta, Tb)
        r.AddPotential(drv)
        return r

    return base, build_anh


def exact_kappa(nmd):
    """Cached zero-MC theory value for this tier, if available."""
    fn = os.path.join(HERE, f"flagship_exact_nmd{nmd}.npz")
    if os.path.exists(fn):
        d = np.load(fn)
        return float(d["j_nat"]), "exact_gle attractor theory"
    return None, None


def main():
    from sclmd_tpu import units as U
    from sclmd_tpu.parallel.ensemble import harmonic_twin_delta
    from sclmd_tpu.utils.junction import partition_by_axis

    def arg(name, default, cast=int):
        return cast(sys.argv[sys.argv.index(name) + 1]) \
            if name in sys.argv else default

    ntraj = arg("--ntraj", 32)
    nmd = 2 ** arg("--nmd", 14)
    seed = arg("--seed", 11)
    equil = arg("--equil", 0.25, float)

    negf = np.load(NEGF_CACHE)
    axyz = [[str(e)] + list(map(float, p))
            for e, p in zip(negf["els"], negf["pos"])]
    part = partition_by_axis(axyz)
    dyn = negf["dyn_ev2"]
    TL, TR = T * (1 + DELTA / 2), T * (1 - DELTA / 2)

    build_harm, build_anh = builders(axyz, part, dyn, nmd, seed)
    t0 = time.time()
    d = harmonic_twin_delta(build_harm, build_anh, TL, TR, ntraj,
                            nsteps=nmd, seed=seed, equil_frac=equil)
    wall = time.time() - t0

    j_ref = float(negf["j_nat"])
    j_exact, src = exact_kappa(nmd)
    if j_exact is None:
        j_exact, src = j_ref, "NEGF Landauer (exact cache missing!)"
    dmean = float(d.mean())
    sem = float(d.std() / np.sqrt(len(d)))
    j_anh = j_exact + dmean
    print(f"harmonic-twin delta: ntraj={ntraj} nmd={nmd} seed={seed} "
          f"equil={equil} ({wall:.0f} s)")
    print(f"  anharmonic correction: {dmean / j_ref * 100:+.3f}% of "
          f"the NEGF current, SEM {sem / j_ref * 100:.3f}%")
    print(f"  baseline J_exact from {src}: "
          f"{j_exact / (T * DELTA) * U.CURCOF:.5f} nW/K")
    print(f"  kappa_anh = {j_anh / (T * DELTA) * U.CURCOF:.5f} nW/K  "
          f"vs NEGF {j_ref / (T * DELTA) * U.CURCOF:.5f}: deviation "
          f"{(j_anh - j_ref) / j_ref * 100:+.2f}% (SEM "
          f"{sem / j_ref * 100:.2f}%)")


if __name__ == "__main__":
    main()
