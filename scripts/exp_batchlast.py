"""TPU experiment: batch-LAST ensemble layout with stacked baths.

Hypothesis: the vmap-leading batch layout pays diffuse per-op overhead;
putting the trajectory axis on the minor (lane) dimension and fusing
the two identical baths into one stacked axis cuts op count and aligns
tiles. Toy implementation (2 identical non-local phonon baths, harmonic
dyn) — physics matches run_segment_blocked for this workload.
"""

import json
import sys
import time

import numpy as np


def main(ntrajs=(32, 128), block=64, nmd=2048, reps=3):
    import jax
    import jax.numpy as jnp
    from sclmd_tpu import baths as B
    from sclmd_tpu.md import _next_pow2, _noise_rows
    from sclmd_tpu.models.harmonic import chain_dynmat

    natoms, ml = 100, 1000
    nph = 3 * natoms
    dt, T0 = 0.25 / 0.658, 300.0
    nc = 90
    nb = 2
    dyn = np.asarray(chain_dynmat(nph, 0.04, dtype=jnp.float32))
    mask = np.ones((nph, 1), np.float32)
    gwl = np.linspace(0.0, 0.6, 64)
    gam = np.array([np.eye(nc) * 0.01 * np.exp(-(w / 0.25) ** 2)
                    for w in gwl])
    pbl = B.phbath(T0 * 1.05, range(nc), 0.3, 128, dt, nmd, ml=ml,
                   gamma=gam, gwl=gwl, dtype=jnp.float32)
    pbr = B.phbath(T0 * 0.95, range(nph - nc, nph), 0.3, 128, dt, nmd,
                   ml=ml, gamma=gam, gwl=gwl, dtype=jnp.float32)
    baths = [pbl, pbr]
    cids_cat = np.concatenate([np.asarray(b.cids) for b in baths])

    nfft = _next_pow2(ml + block + 2)

    def segment(dyn_a, mask_a, kern_s, noise_s, ntraj):
        """kern_s: (nb, ml, nc, nc); noise_s: (nb, nmd, nc, T)."""
        nblocks = nmd // block
        dtype = jnp.float32
        # spectra + static slices (in-jit; loop-invariant)
        kpad = jnp.pad(kern_s, ((0, 0), (0, nfft - ml), (0, 0), (0, 0)))
        khat = jnp.fft.rfft(kpad, axis=1)            # (nb, nf, nc, nc)
        kim = jnp.transpose(kern_s, (0, 2, 1, 3)).reshape(
            nb, nc, ml * nc)                          # (nb, nc, ml*nc)
        pad = (block + 2) * nc - (ml - 1) * nc
        kim_p = jnp.pad(kim[:, :, nc:], ((0, 0), (0, 0), (0, max(0, pad))))
        # Kcat rows: [taps 1..B ; taps 2..B+1] -> (nb, 2nc, B*nc)
        kcat = jnp.concatenate([kim_p[:, :, : block * nc],
                                kim_p[:, :, nc: (block + 1) * nc]],
                               axis=1)
        k0 = kern_s[:, 0]                             # (nb, nc, nc)
        k1 = kern_s[:, 1]
        k01 = jnp.concatenate([k0, k1], axis=1)       # (nb, 2nc, nc)

        # noise streams: rows t and t+1, (nblocks, block, nb, nc, T)
        def rows(off):
            r = jnp.stack([_noise_rows(noise_s[i], nmd, 0, off, nmd)
                           for i in range(nb)], axis=1)
            return r.reshape(nblocks, block, nb, nc, ntraj)
        xs_outer = (rows(0), rows(1))

        cids = jnp.asarray(cids_cat)

        def inner(carry, xs):
            p, q, ring = carry        # p,q: (nph,T); ring: (nb, B, nc, T)
            n0, n1, op_, oc_ = xs     # (nb, nc, T) each
            pc = p[cids].reshape(nb, nc, ntraj)
            tails = kcat @ ring.reshape(nb, block * nc, ntraj)
            k01p = k01 @ pc                            # (nb, 2nc, T)
            conv0 = k01p[:, :nc] + tails[:, :nc] + op_
            fb = n0 - conv0 * dt                       # (nb, nc, T)
            corr_base = k01p[:, nc:] + tails[:, nc:] + oc_
            f = (-(dyn_a @ q)).at[cids].add(
                fb.reshape(nb * nc, ntraj))
            pthalf = p + f * (dt / 2)
            qtt = q + p * dt + f * (dt * dt / 2)
            cur = jnp.einsum("bct,bct->bt", fb, pc)
            pf2 = -(dyn_a @ qtt)

            def bath_sum(pt):
                ptc = pt[cids].reshape(nb, nc, ntraj)
                fl = n1 - (k0 @ ptc + corr_base) * dt
                return pf2.at[cids].add(fl.reshape(nb * nc, ntraj))

            ptt1 = pthalf + (dt / 2) * bath_sum(pthalf)
            ptt2 = (pthalf + (dt / 2) * bath_sum(ptt1)) * mask_a
            qtt = qtt * mask_a
            ring = jnp.roll(ring, 1, axis=1).at[:, 0].set(pc)
            return (ptt2, qtt, ring), cur

        def outer(carry, xs_blk):
            p, q, hist = carry        # hist: (nb, ml-1, nc, T)
            hhat = jnp.fft.rfft(hist, n=nfft, axis=1)
            prod = jnp.einsum("bfij,bfjt->bfit", khat,
                              jnp.conjugate(hhat))
            corr = jnp.fft.irfft(prod, n=nfft, axis=1)
            O = corr[:, 1:block + 2]                   # (nb, B+1, nc, T)
            n0b, n1b = xs_blk                          # (block, nb, nc, T)
            xs_in = (n0b, n1b,
                     jnp.swapaxes(O[:, :block], 0, 1),
                     jnp.swapaxes(O[:, 1:block + 1], 0, 1))
            ring = jnp.zeros((nb, block, nc, ntraj), dtype)
            (p, q, ring), cur = jax.lax.scan(inner, (p, q, ring), xs_in,
                                             length=block)
            # ring rows are newest-first already (roll+set at row 0)
            hist = jnp.concatenate([ring, hist], axis=1)[:, : ml - 1]
            return (p, q, hist), cur

        p0 = jnp.zeros((nph, ntraj), dtype)
        q0 = jnp.zeros((nph, ntraj), dtype)
        h0 = jnp.zeros((nb, ml - 1, nc, ntraj), dtype)
        (p, q, _), curs = jax.lax.scan(outer, (p0, q0, h0), xs_outer,
                                       length=nblocks)
        return p, jnp.mean(curs, axis=(0, 1))

    for ntraj in ntrajs:
        noise = np.stack([
            np.stack([np.asarray(baths[i].gnoi_np(1000 * i + t).noise).T
                      for t in range(ntraj)], axis=-1)
            for i in range(nb)])                      # (nb, nc?, ...)
        # gnoi_np gives (nmd, nc); .T -> (nc, nmd); want (nb, nmd, nc, T)
        noise = noise.transpose(0, 2, 1, 3)
        kern_s = np.stack([np.asarray(b.kernel) for b in baths])

        f = jax.jit(lambda d, m, k, nz: segment(d, m, k, nz, ntraj))
        t0 = time.perf_counter()
        out = f(dyn, mask, kern_s, noise.astype(np.float32))
        jax.block_until_ready(out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(dyn, mask, kern_s, noise.astype(np.float32))
            jax.block_until_ready(out)
        tr = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "tag": f"batchlast ntraj={ntraj} block={block}",
            "compile_s": round(tc, 1),
            "ms_per_step": round(tr / nmd * 1e3, 3),
            "traj_steps_per_sec": round(ntraj * nmd / tr, 1),
            "finite": bool(np.isfinite(np.asarray(out[1])).all()),
        }), flush=True)


if __name__ == "__main__":
    ntrajs = tuple(int(x) for x in sys.argv[1].split(",")) \
        if len(sys.argv) > 1 else (32, 128)
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(ntrajs, block)
