"""Benchmark: GLE MD throughput on the north-star workloads.

Primary (BASELINE.md:20-22): 100-atom junction (300 DOF), two
non-Markovian phonon baths with a 1000-tap memory kernel each, quantum
colored noise — blocked-convolution integrator (md.run_segment_blocked),
one compiled program per segment. Baseline: CPU reference sclmd at
~12.5 velocity-Verlet steps/s (flow/sclmd.dot:270; that figure is the
vv loop only, so the headline here is also scan-only; the
noise-regeneration-inclusive figure is reported alongside).

Secondary (BASELINE.md:23, config 5): 1,000 vmapped trajectories on a
500-atom junction (1500 DOF, 150-DOF leads), noise sampled ON DEVICE
from host-precomputed PSD factors.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_STEPS_PER_SEC = 12.5


def _sync(x):
    import jax
    jax.block_until_ready(x)
    return x


def _timed(fn, reps=5):
    """Median wall time of reps calls (the tunnel chip is shared:
    run-to-run variance on short programs is +-40%, so single-shot
    timings are not reproducible; medians are)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], min(ts)


def primary(jax, jnp):
    from sclmd_tpu import baths as B
    from sclmd_tpu.md import (GLESystem, initial_state, run_segment_blocked)
    from sclmd_tpu.models.harmonic import chain_dynmat

    natoms, ml, nmd = 100, 1000, 2048
    nph = 3 * natoms
    dt, T, delta = 0.25 / 0.658, 300.0, 0.1
    nc = 90

    dyn = np.asarray(chain_dynmat(nph, 0.04, dtype=jnp.float32))
    mask = np.ones(nph, np.float32)
    gwl = np.linspace(0.0, 0.6, 64)
    gam = np.array([np.eye(nc) * 0.01 * np.exp(-(w / 0.25) ** 2)
                    for w in gwl])

    def mkbath(dofs, temp):
        return B.phbath(temp, dofs, 0.3, 128, dt, nmd, ml=ml,
                        gamma=gam, gwl=gwl, dtype=jnp.float32)

    pbl = mkbath(range(nc), T * (1 + delta / 2))
    pbr = mkbath(range(nph - nc, nph), T * (1 - delta / 2))

    def scan_run(block):
        @jax.jit
        def f(dyn_a, mask_a, bl, br):
            system = GLESystem(dyn=dyn_a, baths=(bl, br), mask=mask_a,
                               dt=dt, nph=nph, ml=ml, nmd=nmd,
                               unconstrained=True)
            st = initial_state(system)
            fin, ys = run_segment_blocked(system, st, nmd, 0, block=block)
            cur = ys["cur"][nmd // 4:]
            return (fin.p, jnp.mean(cur[:, 0]), jnp.mean(cur[:, 1]),
                    jnp.isfinite(ys["etot"]).all())
        return f

    # ---- single trajectory, scan-only (noise passed in) ----
    bl = pbl.gnoi_np(2).replace(nevecs=None, nstd=None)
    br = pbr.gnoi_np(3).replace(nevecs=None, nstd=None)
    f1 = scan_run(64)
    out = _sync(f1(dyn, mask, bl, br))                # compile
    _, jl, jr, finite = out[0], out[1], out[2], out[3]
    t_med, t_best = _timed(lambda: f1(dyn, mask, bl, br), reps=7)
    single_sps = nmd / t_med
    single_best = nmd / t_best

    # ---- same, including per-run noise regeneration (the reference
    # workflow regenerates noise every run; r1's bench timed the HOST
    # regeneration, which is why its number undershot the scan-only
    # claim). The production md.Run path now samples on device from the
    # host-precomputed PSD factors (baths.gnoi -> sample_noise_dev) —
    # both that number and the legacy host-numpy regen are reported. ----
    seed = [0]

    def regen_dev():
        seed[0] += 1
        k = jax.random.PRNGKey(seed[0])
        bl2 = pbl.gnoi(jax.random.fold_in(k, 0)).replace(
            nevecs=None, nstd=None)
        br2 = pbr.gnoi(jax.random.fold_in(k, 1)).replace(
            nevecs=None, nstd=None)
        return f1(dyn, mask, bl2, br2)

    _sync(regen_dev())                                  # compile sampler
    t_med, _ = _timed(regen_dev, reps=3)
    regen_sps = nmd / t_med

    def regen_host():
        seed[0] += 1
        bl2 = pbl.gnoi_np(10 + seed[0]).replace(nevecs=None, nstd=None)
        br2 = pbr.gnoi_np(20 + seed[0]).replace(nevecs=None, nstd=None)
        return f1(dyn, mask, bl2, br2)

    t_med, _ = _timed(regen_host, reps=3)
    regen_host_sps = nmd / t_med

    # ---- ensembles (blocked, block=256 — measured best on this chip) ----
    from sclmd_tpu.md import run_segment_blocked as rsb

    def ens_run(block, ntraj):
        @jax.jit
        def f(dyn_a, mask_a, bl, br, nzL, nzR):
            def one(nzl, nzr):
                system = GLESystem(
                    dyn=dyn_a, baths=(bl.replace(noise=nzl),
                                      br.replace(noise=nzr)),
                    mask=mask_a, dt=dt, nph=nph, ml=ml, nmd=nmd,
                    unconstrained=True)
                st = initial_state(system)
                fin, ys = rsb(system, st, nmd, 0, block=block)
                return (jnp.mean(ys["cur"], axis=0),
                        jnp.isfinite(ys["etot"]).all())
            curs, fins = jax.vmap(one)(nzL, nzR)
            return jnp.mean(curs, axis=0), fins.all()
        return f

    bl0 = pbl.replace(nevecs=None, nstd=None, noise=None)
    br0 = pbr.replace(nevecs=None, nstd=None, noise=None)
    ens = {}
    for ntraj in (32, 256):
        nzL = np.stack([np.asarray(pbl.gnoi_np(100 + i).noise)
                        for i in range(ntraj)])
        nzR = np.stack([np.asarray(pbr.gnoi_np(10000 + i).noise)
                        for i in range(ntraj)])
        f = ens_run(256, ntraj)
        _sync(f(dyn, mask, bl0, br0, nzL, nzR))
        t_med, _ = _timed(lambda: f(dyn, mask, bl0, br0, nzL, nzR),
                          reps=5 if ntraj <= 32 else 3)
        ens[ntraj] = round(ntraj * nmd / t_med, 1)
    return {
        "single_sps": single_sps, "single_best_sps": single_best,
        "regen_sps": regen_sps, "regen_host_sps": regen_host_sps,
        "ens": ens, "J_left": float(jl), "J_right": float(jr),
        "finite": bool(finite),
    }


def config5(jax, jnp):
    """BASELINE.md:23 secondary metric: 1k vmapped trajectories,
    500-atom junction. Noise sampled on device from host factors."""
    from sclmd_tpu import baths as B
    from sclmd_tpu.md import GLESystem, initial_state, run_segment_blocked
    from sclmd_tpu.models.harmonic import chain_dynmat

    natoms, ml, nmd, ntraj, block = 500, 512, 1024, 1000, 64
    nph = 3 * natoms
    dt, T, delta = 0.25 / 0.658, 300.0, 0.1
    nc = 150

    dyn = np.asarray(chain_dynmat(nph, 0.04, dtype=jnp.float32))
    mask = np.ones(nph, np.float32)
    gwl = np.linspace(0.0, 0.6, 48)
    gam = np.array([np.eye(nc) * 0.01 * np.exp(-(w / 0.25) ** 2)
                    for w in gwl])

    def mkbath(dofs, temp):
        return B.phbath(temp, dofs, 0.3, 96, dt, nmd, ml=ml,
                        gamma=gam, gwl=gwl, dtype=jnp.float32)

    pbl = mkbath(range(nc), T * (1 + delta / 2))
    pbr = mkbath(range(nph - nc, nph), T * (1 - delta / 2))

    # device-side batched noise synthesis (gnoi routes through the
    # tunnel-safe sample_noise_dev: real/imag factor split, and the
    # single-matrix fast path for frequency-proportional spectra)
    def draw(bath, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), ntraj)
        return _sync(jax.vmap(lambda k: bath.gnoi(k).noise)(keys))

    nzL = draw(pbl, 1)
    nzR = draw(pbr, 2)
    bl0 = pbl.replace(nevecs=None, nstd=None, noise=None)
    br0 = pbr.replace(nevecs=None, nstd=None, noise=None)

    @jax.jit
    def f(dyn_a, mask_a, bl, br, nzL, nzR):
        def one(nzl, nzr):
            system = GLESystem(
                dyn=dyn_a, baths=(bl.replace(noise=nzl),
                                  br.replace(noise=nzr)),
                mask=mask_a, dt=dt, nph=nph, ml=ml, nmd=nmd)
            st = initial_state(system)
            fin, ys = run_segment_blocked(system, st, nmd, 0,
                                          block=block)
            return (jnp.mean(ys["cur"], axis=0),
                    jnp.isfinite(ys["etot"]).all())
        curs, fins = jax.vmap(one)(nzL, nzR)
        return jnp.mean(curs, axis=0), fins.all()

    o = _sync(f(dyn, mask, bl0, br0, nzL, nzR))
    t_med, _ = _timed(lambda: f(dyn, mask, bl0, br0, nzL, nzR), reps=3)
    return {"tsps": round(ntraj * nmd / t_med, 1),
            "finite": bool(np.asarray(o[1])),
            "ntraj": ntraj, "atoms": natoms}


def flagship(jax, jnp):
    """The reference's own headline workload: its 201-atom C/H
    structure.data junction (ref examples/runmd.py, 12.5 steps/s on
    CPU) as a vmapped ensemble with full many-body CHDriver forces
    inside the scan. Relaxation + Hessian are setup; the timed part is
    RunEnsemble (which includes per-run device-side noise synthesis).
    """
    import os
    import tempfile

    data = "/root/reference/examples/structure.data"
    if not os.path.exists(data):
        return None
    from sclmd_tpu import baths as B
    from sclmd_tpu.md import md as MDRunner
    from sclmd_tpu.models.hydrocarbon import CHDriver
    from sclmd_tpu.utils.io import read_lammps_data
    from sclmd_tpu.utils.junction import (partition_by_axis,
                                          relax_for_model)

    axyz = read_lammps_data(data)["axyz"]
    part = partition_by_axis(axyz)
    axyz, _, _ = relax_for_model(axyz, CHDriver, part["fixed_atoms"])
    drv = CHDriver(axyz, dtype=jnp.float32)

    ntraj, nmd = 128, 1024
    T, delta, dt = 300.0, 0.1, 0.25 / 0.658
    tmp = tempfile.mkdtemp(prefix="bench_flagship_")
    runner = MDRunner(dt, nmd, T, axyz=axyz,
                      dyn=np.asarray(drv.dynmat()), dtype=jnp.float32,
                      outdir=tmp)
    runner.AddPotential(drv)
    damp = 100 / 0.658211814201041
    for cats, tt in ((part["ecatsl"], T * (1 + delta / 2)),
                     (part["ecatsr"], T * (1 - delta / 2))):
        eta = (1.0 / damp) * np.identity(len(cats))
        runner.AddBath(B.ebath(cats, tt, runner.dt, runner.nmd,
                               wmax=1.0, nw=500, efric=eta))
    runner.AddConstr([part["fixdofs"]])

    runner.RunEnsemble(ntraj, nsteps=nmd)          # compile
    t_med, _ = _timed(lambda: runner.RunEnsemble(ntraj, nsteps=nmd),
                      reps=3)
    return {"tsps": round(ntraj * nmd / t_med, 1), "ntraj": ntraj,
            "atoms": len(axyz)}


def main():
    import jax
    import jax.numpy as jnp

    # flagship FIRST: measured ~23-25k traj-steps/s in a clean process
    # but systematically ~15k when run after primary's programs (exact
    # mechanism unidentified — zero live device arrays remain, so
    # likely allocator/executable residue; ordering sidesteps it)
    try:
        fs = flagship(jax, jnp)
    except Exception as e:          # noqa: BLE001 — keep the bench alive
        import sys
        import traceback
        print(f"flagship bench section failed: {e!r}", file=sys.stderr)
        traceback.print_exc()
        fs = None
    p = primary(jax, jnp)
    c5 = config5(jax, jnp)

    best_ens = max(p["ens"].values())
    result = {
        "metric": "GLE steps/sec (100-atom junction, 1000-tap kernel, "
                  "blocked integrator, scan-only)",
        "value": round(p["single_sps"], 1),
        "unit": "steps/s",
        "vs_baseline": round(p["single_sps"] / BASELINE_STEPS_PER_SEC, 1),
        "single_best_steps_per_sec": round(p["single_best_sps"], 1),
        "with_noise_regen_steps_per_sec": round(p["regen_sps"], 1),
        "with_host_noise_regen_steps_per_sec": round(p["regen_host_sps"], 1),
        "timing": "median over repeated runs (shared chip, +-40% "
                  "single-shot variance)",
        "ensemble_traj_steps_per_sec": best_ens,
        "ensemble_block": 256,
        "ensemble_scaling": {str(k): v for k, v in p["ens"].items()},
        "ensemble_vs_baseline": round(best_ens / BASELINE_STEPS_PER_SEC, 1),
        "config5_traj_steps_per_sec": c5["tsps"],
        "config5_ntraj": c5["ntraj"],
        "config5_atoms": c5["atoms"],
        "config5_finite": c5["finite"],
        "flagship_structure_data_traj_steps_per_sec":
            None if fs is None else fs["tsps"],
        "flagship_ntraj": None if fs is None else fs["ntraj"],
        "flagship_vs_reference_12p5":
            None if fs is None
            else round(fs["tsps"] / BASELINE_STEPS_PER_SEC, 1),
        "finite": p["finite"],
        "J_left": p["J_left"],
        "J_right": p["J_right"],
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
