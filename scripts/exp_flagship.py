"""Flagship-workload TPU measurement: the reference's own 201-atom C/H
structure.data junction (ref examples/runmd.py — 12.5 steps/s on CPU,
BASELINE.md) driven by CHDriver inside the jitted scan, as a vmapped
ensemble on the chip.

Two phases (relaxation needs f64 — CPU; MD runs on the TPU):

    SCLMD_PLATFORM=cpu python scripts/exp_flagship.py relax
    python scripts/exp_flagship.py run [ntraj] [nmd]

Phase ``relax`` writes relaxed_structure.npz next to this script.
"""

import os
import sys
import time

import numpy as np

from sclmd_tpu.utils.platform import select_platform

select_platform()

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(HERE, "relaxed_structure.npz")
DATA = "/root/reference/examples/structure.data"


def make_driver(a, dtype):
    from sclmd_tpu.models.hydrocarbon import CHDriver
    return CHDriver(a, dtype=dtype)


def phase_relax():
    import jax.numpy as jnp

    from sclmd_tpu.utils.io import read_lammps_data
    from sclmd_tpu.utils.junction import (partition_by_axis,
                                          relax_for_model)

    axyz = read_lammps_data(DATA)["axyz"]
    part = partition_by_axis(axyz)
    axyz, fmax, nit = relax_for_model(
        axyz, lambda a: make_driver(a, jnp.float64),
        part["fixed_atoms"])
    print(f"relaxed: fmax={fmax:.2e} ({nit} steps)")
    np.savez(CACHE,
             els=np.array([a[0] for a in axyz]),
             pos=np.array([a[1:] for a in axyz]))


def phase_run(ntraj=32, nmd=2048):
    import jax.numpy as jnp

    from sclmd_tpu import baths as B
    from sclmd_tpu.md import md
    from sclmd_tpu.utils.junction import partition_by_axis

    ck = np.load(CACHE)
    axyz = [[str(e)] + list(map(float, p))
            for e, p in zip(ck["els"], ck["pos"])]
    part = partition_by_axis(axyz)
    drv = make_driver(axyz, jnp.float32)
    print("driver ready", flush=True)

    T, delta, dt = 300.0, 0.1, 0.25 / 0.658
    runner = md(dt, nmd, T, axyz=axyz, dyn=np.asarray(drv.dynmat()),
                dtype=jnp.float32)
    runner.AddPotential(drv)
    damp = 100 / 0.658211814201041
    for cats, tt in ((part["ecatsl"], T * (1 + delta / 2)),
                     (part["ecatsr"], T * (1 - delta / 2))):
        eta = (1.0 / damp) * np.identity(len(cats))
        runner.AddBath(B.ebath(cats, tt, runner.dt, runner.nmd,
                               wmax=1.0, nw=500, bias=0.0, efric=eta))
    runner.AddConstr([part["fixdofs"]])

    # warm-up compile
    t0 = time.time()
    runner.RunEnsemble(ntraj, nsteps=nmd)
    print("cold (incl. compile): %.1f s" % (time.time() - t0),
          flush=True)
    times = []
    for rep in range(3):
        for f in os.listdir("."):
            if f.startswith("kappa."):
                os.remove(f)
        t0 = time.time()
        runner.RunEnsemble(ntraj, nsteps=nmd)
        times.append(time.time() - t0)
    tmed = sorted(times)[len(times) // 2]
    rate = ntraj * nmd / tmed
    print("flagship ensemble: ntraj=%d nmd=%d median %.2f s -> "
          "%.0f traj-steps/s (%.0fx the 12.5 steps/s reference)"
          % (ntraj, nmd, tmed, rate, rate / 12.5))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "relax":
        phase_relax()
    else:
        ntraj = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        nmd = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
        phase_run(ntraj, nmd)
