"""Benchmark: GLE MD throughput on the north-star workload.

Workload (BASELINE.md): 100-atom junction (300 DOF), two non-Markovian
phonon baths with a 1000-tap memory kernel each, quantum colored noise —
one jitted lax.scan on the TPU chip. Baseline: CPU reference sclmd at
~12.5 velocity-Verlet steps/s (flow/sclmd.dot:270, 201-atom junction,
ml=1 baths; our workload carries a 1000x longer memory kernel).

Prints ONE JSON line:
  {"metric": "GLE steps/sec", "value": N, "unit": "steps/s",
   "vs_baseline": N/12.5, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_STEPS_PER_SEC = 12.5


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from sclmd_tpu import baths as B
    from sclmd_tpu.md import GLESystem, initial_state, vv_step
    from sclmd_tpu.models.harmonic import chain_dynmat

    natoms = 100
    nph = 3 * natoms
    ml = 1000
    dt = 0.25 / 0.658
    nmd = 2048
    T, delta = 300.0, 0.1
    nbath_dofs = 90          # 30 atoms per lead

    dyn = np.asarray(chain_dynmat(nph, 0.04, dtype=jnp.float32))
    mask = np.ones(nph, np.float32)
    gwl = np.linspace(0.0, 0.6, 64)
    gam = np.array([np.eye(nbath_dofs) * 0.01 * np.exp(-(w / 0.25) ** 2)
                    for w in gwl])

    def mkbath(dofs, temp):
        return B.phbath(temp, dofs, 0.3, 128, dt, nmd, ml=ml,
                        gamma=gam, gwl=gwl, dtype=jnp.float32)

    pbl = mkbath(range(nbath_dofs), T * (1 + delta / 2))
    pbr = mkbath(range(nph - nbath_dofs, nph), T * (1 - delta / 2))

    # noise sampling happens host-side; the MD scan + scalar stats are
    # one compiled program (see sclmd_tpu.md.run_segment for the
    # roll-based noise streaming).
    from sclmd_tpu.md import run_segment

    @jax.jit
    def scan_run(dyn_a, mask_a, bl, br):
        system = GLESystem(dyn=dyn_a, baths=(bl, br), mask=mask_a,
                           dt=dt, nph=nph, ml=ml, nmd=nmd)
        state = initial_state(system)
        final, ys = run_segment(system, state, nmd, 0)
        cur = ys["cur"][nmd // 4:]
        return (final, jnp.mean(cur[:, 0]), jnp.mean(cur[:, 1]),
                jnp.isfinite(ys["etot"]).all())

    def run(seed):
        # host-side noise synthesis: clean numpy buffers into the scan
        bl = pbl.gnoi_np(2 * seed).replace(nevecs=None, nstd=None)
        br = pbr.gnoi_np(2 * seed + 1).replace(nevecs=None, nstd=None)
        return scan_run(dyn, mask, bl, br)

    # warm-up / compile
    out = run(0)
    jax.block_until_ready(out[0].p)

    # timing: the MD scan alone (noise synthesis is per-run setup;
    # regenerate anyway to keep parity with the reference's workflow)
    t0 = time.perf_counter()
    reps = 3
    for r in range(1, reps + 1):
        out = run(r)
        jax.block_until_ready(out[0].p)
    t1 = time.perf_counter()

    _, jl, jr, finite = out
    steps_per_sec = reps * nmd / (t1 - t0)

    # --- secondary metric: batched trajectory ensemble ------------------
    # (BASELINE.json config 5) — same workload, ntraj independent noise
    # realisations vmapped into one program; kernel reads amortise
    # across the batch on the MXU.
    ntraj = 32
    noiseL = np.stack([np.asarray(
        pbl.gnoi_np(100 + i).noise) for i in range(ntraj)])
    noiseR = np.stack([np.asarray(
        pbr.gnoi_np(200 + i).noise) for i in range(ntraj)])

    @jax.jit
    def ens_run(dyn_a, mask_a, bl, br, nzL, nzR):
        def one(nzl, nzr):
            system = GLESystem(
                dyn=dyn_a, baths=(bl.replace(noise=nzl),
                                  br.replace(noise=nzr)),
                mask=mask_a, dt=dt, nph=nph, ml=ml, nmd=nmd)
            state = initial_state(system)
            final, ys = run_segment(system, state, nmd, 0)
            return jnp.mean(ys["cur"], axis=0), \
                jnp.isfinite(ys["etot"]).all()
        curs, fins = jax.vmap(one)(nzL, nzR)
        return curs, fins.all()

    bl0 = pbl.gnoi_np(0).replace(nevecs=None, nstd=None, noise=None)
    br0 = pbr.gnoi_np(1).replace(nevecs=None, nstd=None, noise=None)
    o = ens_run(dyn, mask, bl0, br0, noiseL, noiseR)
    jax.block_until_ready(o)
    t2 = time.perf_counter()
    o = ens_run(dyn, mask, bl0, br0, noiseL, noiseR)
    jax.block_until_ready(o)
    t3 = time.perf_counter()
    traj_steps_per_sec = ntraj * nmd / (t3 - t2)

    result = {
        "metric": "GLE steps/sec (100-atom junction, 1000-tap kernel)",
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 1),
        "ensemble_traj_steps_per_sec": round(traj_steps_per_sec, 1),
        "ensemble_ntraj": ntraj,
        "ensemble_vs_baseline": round(
            traj_steps_per_sec / BASELINE_STEPS_PER_SEC, 1),
        "finite": bool(finite),
        "J_left": float(jl),
        "J_right": float(jr),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
