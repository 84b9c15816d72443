"""TPU experiment: inner-scan unrolling in run_segment_blocked."""
import json, sys, time
import numpy as np

def main(ntrajs=(1, 128), unrolls=(1, 4, 8)):
    import jax, jax.numpy as jnp
    from sclmd_tpu import baths as B
    from sclmd_tpu.md import GLESystem, initial_state, run_segment_blocked
    from sclmd_tpu.models.harmonic import chain_dynmat

    natoms, ml, nmd = 100, 1000, 2048
    nph, nc = 3 * natoms, 90
    dt, T = 0.25 / 0.658, 300.0
    dyn = np.asarray(chain_dynmat(nph, 0.04, dtype=jnp.float32))
    mask = np.ones(nph, np.float32)
    gwl = np.linspace(0.0, 0.6, 64)
    gam = np.array([np.eye(nc) * 0.01 * np.exp(-(w / 0.25) ** 2) for w in gwl])
    def mk(d, t): return B.phbath(t, d, 0.3, 128, dt, nmd, ml=ml, gamma=gam, gwl=gwl, dtype=jnp.float32)
    pbl, pbr = mk(range(nc), T*1.05), mk(range(nph-nc, nph), T*0.95)
    bl0 = pbl.replace(nevecs=None, nstd=None, noise=None)
    br0 = pbr.replace(nevecs=None, nstd=None, noise=None)

    for ntraj in ntrajs:
        nzL = np.stack([np.asarray(pbl.gnoi_np(100+i).noise) for i in range(ntraj)])
        nzR = np.stack([np.asarray(pbr.gnoi_np(10**4+i).noise) for i in range(ntraj)])
        for unroll in unrolls:
            block = 256 if ntraj > 1 else 64
            @jax.jit
            def f(dyn_a, mask_a, bl, br, nl, nr):
                def one(nzl, nzr):
                    system = GLESystem(dyn=dyn_a, baths=(bl.replace(noise=nzl), br.replace(noise=nzr)),
                                       mask=mask_a, dt=dt, nph=nph, ml=ml, nmd=nmd)
                    st = initial_state(system)
                    fin, ys = run_segment_blocked(system, st, nmd, 0, block=block, unroll=unroll)
                    return jnp.mean(ys["cur"], axis=0), jnp.isfinite(ys["etot"]).all()
                c, fl = jax.vmap(one)(nl, nr)
                return jnp.mean(c), fl.all()
            t0 = time.perf_counter()
            o = f(dyn, mask, bl0, br0, nzL, nzR); jax.block_until_ready(o)
            tc = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                o = f(dyn, mask, bl0, br0, nzL, nzR); jax.block_until_ready(o)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            tr = ts[len(ts)//2]
            print(json.dumps({"ntraj": ntraj, "unroll": unroll, "block": block,
                              "compile_s": round(tc,1),
                              "traj_steps_per_sec": round(ntraj*nmd/tr,1),
                              "finite": bool(np.asarray(o[1]))}), flush=True)

if __name__ == "__main__":
    main()
