"""TPU experiment: blocked vs plain integrator on the bench workload.

Prints one JSON line per configuration. Not the driver bench — a
measurement harness for picking block sizes and recording the scaling
story (CLAUDE.md bench history).
"""

import json
import sys
import time

import numpy as np


def main(ntrajs=(1, 32, 128, 256), blocks=(0, 64), reps=2):
    import jax
    import jax.numpy as jnp
    from sclmd_tpu import baths as B
    from sclmd_tpu.md import (GLESystem, initial_state, run_segment,
                              run_segment_blocked)
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

    def run_one(block):
        @jax.jit
        def f(dyn_a, mask_a, bl, br):
            system = GLESystem(dyn=dyn_a, baths=(bl, br), mask=mask_a,
                               dt=dt, nph=nph, ml=ml, nmd=nmd)
            st = initial_state(system)
            if block:
                fin, ys = run_segment_blocked(system, st, nmd, 0,
                                              block=block)
            else:
                fin, ys = run_segment(system, st, nmd, 0)
            return (fin.p, jnp.mean(ys["cur"], axis=0),
                    jnp.isfinite(ys["etot"]).all())
        return f

    def run_ens(block, ntraj):
        @jax.jit
        def f(dyn_a, mask_a, bl, br, nzL, nzR):
            def one(nzl, nzr):
                system = GLESystem(
                    dyn=dyn_a, baths=(bl.replace(noise=nzl),
                                      br.replace(noise=nzr)),
                    mask=mask_a, dt=dt, nph=nph, ml=ml, nmd=nmd)
                st = initial_state(system)
                if block:
                    fin, ys = run_segment_blocked(system, st, nmd, 0,
                                                  block=block)
                else:
                    fin, ys = run_segment(system, st, nmd, 0)
                return (jnp.mean(ys["cur"], axis=0),
                        jnp.isfinite(ys["etot"]).all())
            curs, fins = jax.vmap(one)(nzL, nzR)
            return jnp.mean(curs, axis=0), fins.all()
        return f

    bl0 = pbl.gnoi_np(0).replace(nevecs=None, nstd=None)
    br0 = pbr.gnoi_np(1).replace(nevecs=None, nstd=None)

    for block in blocks:
        for ntraj in ntrajs:
            tag = f"block={block or 'plain'} ntraj={ntraj}"
            try:
                if ntraj == 1:
                    f = run_one(block)
                    args = (dyn, mask, bl0, br0)
                else:
                    rng = np.random.default_rng(7)
                    nzL = np.stack([np.asarray(
                        pbl.gnoi_np(100 + i).noise)
                        for i in range(ntraj)])
                    nzR = np.stack([np.asarray(
                        pbr.gnoi_np(10000 + i).noise)
                        for i in range(ntraj)])
                    f = run_ens(block, ntraj)
                    args = (dyn, mask,
                            bl0.replace(noise=None), br0.replace(noise=None),
                            nzL, nzR)
                t0 = time.perf_counter()
                out = f(*args)
                import jax as _j
                _j.block_until_ready(out)
                tc = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = f(*args)
                    _j.block_until_ready(out)
                tr = (time.perf_counter() - t0) / reps
                sps = nmd / tr
                print(json.dumps({
                    "tag": tag, "compile_s": round(tc, 1),
                    "steps_per_sec": round(sps, 1),
                    "traj_steps_per_sec": round(sps * ntraj, 1),
                    "finite": bool(np.asarray(out[-1])),
                }), flush=True)
            except Exception as e:  # record and continue the sweep
                print(json.dumps({"tag": tag,
                                  "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    ntrajs = tuple(int(x) for x in sys.argv[1].split(",")) \
        if len(sys.argv) > 1 else (1, 32, 128, 256)
    blocks = tuple(int(x) for x in sys.argv[2].split(",")) \
        if len(sys.argv) > 2 else (0, 64)
    main(ntrajs, blocks)
