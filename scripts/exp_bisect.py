"""Bisect the blocked-step cost on TPU: which component scales with ntraj?

Local modified copies of the blocked runner with individual pieces
disabled (physics-wrong, timing-only)."""

import json
import sys
import time
from functools import partial

import numpy as np


def main(ntraj=128, block=64, nmd=512, variants=("full", "noO", "notails",
                                                 "noring", "nopot",
                                                 "noscatter")):
    import jax
    import jax.numpy as jnp
    from sclmd_tpu import baths as B
    from sclmd_tpu.baths import PhBath
    from sclmd_tpu.md import GLESystem, initial_state, _noise_rows, \
        _next_pow2, MDState
    from sclmd_tpu.models.harmonic import chain_dynmat
    from sclmd_tpu.ops.functions import rpadleft

    natoms, ml = 100, 1000
    nph = 3 * natoms
    dt, T = 0.25 / 0.658, 300.0
    nc = 90
    dyn = np.asarray(chain_dynmat(nph, 0.04, dtype=jnp.float32))
    mask = np.ones(nph, np.float32)
    gwl = np.linspace(0.0, 0.6, 64)
    gam = np.array([np.eye(nc) * 0.01 * np.exp(-(w / 0.25) ** 2)
                    for w in gwl])
    pbl = B.phbath(T * 1.05, range(nc), 0.3, 128, dt, nmd, ml=ml,
                   gamma=gam, gwl=gwl, dtype=jnp.float32)
    pbr = B.phbath(T * 0.95, range(nph - nc, nph), 0.3, 128, dt, nmd,
                   ml=ml, gamma=gam, gwl=gwl, dtype=jnp.float32)

    def blocked(system, state, nsteps, t0, block, variant):
        nmd_ = system.nmd
        nblocks = nsteps // block
        dt_ = system.dt
        dtype = state.p.dtype
        nph_ = system.nph
        plans, hists = [], []
        for b in system.baths:
            nfft = _next_pow2(b.ml + block + 2)
            kpad = jnp.pad(b.kernel, ((0, nfft - b.ml), (0, 0), (0, 0)))
            plans.append({"khat": jnp.fft.rfft(kpad, axis=0),
                          "kin": b.block_tap_kernel(block), "nfft": nfft})
            hists.append(state.phis[: b.ml - 1, b.cids])
        hists = tuple(hists)
        xs_outer = tuple(
            (_noise_rows(b.noise, nmd_, t0, 0, nsteps).reshape(
                nblocks, block, -1),
             _noise_rows(b.noise, nmd_, t0, 1, nsteps).reshape(
                 nblocks, block, -1)) for b in system.baths)

        def scatter(b, fl):
            if variant == "noscatter":
                return jnp.zeros((nph_,), fl.dtype).at[:fl.shape[0]].set(fl)
            return jnp.zeros((nph_,), fl.dtype).at[b.cids].set(fl)

        def inner(carry, xs):
            p, q, rings = carry
            if variant == "nopot":
                pf = -q
            else:
                pf = system.potential_force(q)
            fbaths, corr_bases = [], []
            for i, b in enumerate(system.baths):
                n0, n1, op, oc = xs[i]
                p_c = p[b.cids]
                ncb = b.nc
                if variant == "notails":
                    tails = jnp.zeros((ncb, 2), dtype)
                else:
                    z1 = jnp.zeros((1, ncb), dtype)
                    S = jnp.stack([jnp.concatenate([rings[i], z1], 0),
                                   jnp.concatenate([z1, rings[i]], 0)],
                                  axis=2)
                    tails = plans[i]["kin"] @ S.reshape(
                        (block + 1) * ncb, 2)
                conv = b.kernel[0] @ p_c + tails[:, 0] + op
                fbaths.append(scatter(b, n0 - conv * dt_))
                corr_bases.append(b.kernel[1] @ p_c + tails[:, 1] + oc)
            f = pf
            for fb in fbaths:
                f = f + fb
            pthalf = p + f * (dt_ / 2)
            qtt = q + p * dt_ + f * (dt_ * dt_ / 2)
            cur = jnp.stack([jnp.dot(fb, p) for fb in fbaths])
            pf2 = pf if variant == "nopot" else system.potential_force(qtt)

            def bath_sum(pt):
                out = pf2
                for i, b in enumerate(system.baths):
                    n1 = xs[i][1]
                    out = out + scatter(
                        b, n1 - (b.kernel[0] @ pt[b.cids]
                                 + corr_bases[i]) * dt_)
                return out

            ptt1 = pthalf + (dt_ / 2) * bath_sum(pthalf)
            ptt2 = (pthalf + (dt_ / 2) * bath_sum(ptt1)) * system.mask
            qtt = qtt * system.mask
            if variant == "noring":
                new_rings = rings
            else:
                new_rings = tuple(rpadleft(rings[i], p[b.cids])
                                  for i, b in enumerate(system.baths))
            return (ptt2, qtt, new_rings), {"cur": cur}

        def outer(carry, xs_blk):
            p, q, bhists = carry
            xs_inner = []
            for i, b in enumerate(system.baths):
                n0, n1 = xs_blk[i]
                if variant == "noO":
                    O = jnp.zeros((block + 1, b.nc), dtype)
                else:
                    O = b.block_corr(bhists[i], block, plans[i]["khat"],
                                     plans[i]["nfft"])
                xs_inner.append((n0, n1, O[:block], O[1:block + 1]))
            rings = tuple(jnp.zeros((block, b.nc), dtype)
                          for b in system.baths)
            (p, q, rings), ys = jax.lax.scan(
                inner, (p, q, rings), tuple(xs_inner), length=block)
            new_hists = tuple(
                jnp.concatenate([rings[i], bhists[i]], 0)[: b.ml - 1]
                for i, b in enumerate(system.baths))
            return (p, q, new_hists), ys

        (p, q, _), ys = jax.lax.scan(outer, (state.p, state.q, hists),
                                     xs_outer, length=nblocks)
        return p, ys

    nzL = np.stack([np.asarray(pbl.gnoi_np(100 + i).noise)
                    for i in range(ntraj)])
    nzR = np.stack([np.asarray(pbr.gnoi_np(10000 + i).noise)
                    for i in range(ntraj)])
    bl0 = pbl.replace(nevecs=None, nstd=None, noise=None)
    br0 = pbr.replace(nevecs=None, nstd=None, noise=None)

    for variant in variants:
        @jax.jit
        def f(dyn_a, mask_a, bl, br, nl, nr):
            def one(nzl, nzr):
                system = GLESystem(
                    dyn=dyn_a, baths=(bl.replace(noise=nzl),
                                      br.replace(noise=nzr)),
                    mask=mask_a, dt=dt, nph=nph, ml=ml, nmd=nmd)
                st = initial_state(system)
                p, ys = blocked(system, st, nmd, 0, block, variant)
                return jnp.mean(ys["cur"], axis=0), p
            curs, ps = jax.vmap(one)(nl, nr)
            return jnp.mean(curs), jnp.sum(ps)

        t0 = time.perf_counter()
        o = f(dyn, mask, bl0, br0, nzL, nzR)
        import jax as _j
        _j.block_until_ready(o)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        o = f(dyn, mask, bl0, br0, nzL, nzR)
        _j.block_until_ready(o)
        tr = time.perf_counter() - t0
        print(json.dumps({"variant": variant, "compile_s": round(tc, 1),
                          "ms_per_step": round(tr / nmd * 1e3, 3),
                          "traj_steps_per_sec":
                          round(ntraj * nmd / tr, 1)}), flush=True)


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["ntraj"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["block"] = int(sys.argv[2])
    main(**kw)
