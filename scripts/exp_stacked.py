"""TPU experiment: stacked-bath blocked step (op-count reduction).

Single-trajectory target: fuse the two identical baths into one stacked
axis — one gather, one scatter-add, batched matvecs — roughly halving
the per-step HLO op count vs run_segment_blocked.
"""

import json
import sys
import time

import numpy as np


def main(block=64, nmd=2048, reps=3):
    import jax
    import jax.numpy as jnp
    from sclmd_tpu import baths as B
    from sclmd_tpu.md import _next_pow2, _noise_rows
    from sclmd_tpu.models.harmonic import chain_dynmat

    natoms, ml = 100, 1000
    nph = 3 * natoms
    dt, T0 = 0.25 / 0.658, 300.0
    nc, nb = 90, 2
    dyn = np.asarray(chain_dynmat(nph, 0.04, dtype=jnp.float32))
    mask = np.ones(nph, np.float32)
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

    def segment(dyn_a, mask_a, kern_s, noise_s):
        """kern_s: (nb, ml, nc, nc); noise_s: (nb, nmd, nc)."""
        nblocks = nmd // block
        dtype = jnp.float32
        kpad = jnp.pad(kern_s, ((0, 0), (0, nfft - ml), (0, 0), (0, 0)))
        khat = jnp.fft.rfft(kpad, axis=1)
        kim = jnp.transpose(kern_s, (0, 2, 1, 3)).reshape(
            nb, nc, ml * nc)
        pad = (block + 2) * nc - (ml - 1) * nc
        kim_p = jnp.pad(kim[:, :, nc:],
                        ((0, 0), (0, 0), (0, max(0, pad))))
        kcat = jnp.concatenate([kim_p[:, :, : block * nc],
                                kim_p[:, :, nc: (block + 1) * nc]],
                               axis=1)                 # (nb, 2nc, B*nc)
        k01 = jnp.concatenate([kern_s[:, 0], kern_s[:, 1]], axis=1)
        k0 = kern_s[:, 0]
        cids = jnp.asarray(cids_cat)

        xs_outer = jnp.stack(
            [_noise_rows(noise_s[i], nmd, 0, 1, nmd) for i in range(nb)],
            axis=1).reshape(nblocks, block, nb, nc)
        nrow0 = noise_s[:, 0]

        def inner(carry, xs):
            p, q, ring, n0 = carry   # ring: (nb, B, nc)
            n1, op_, oc_ = xs        # (nb, nc) each
            pc = p[cids].reshape(nb, nc)
            tails = jnp.einsum("bik,bk->bi", kcat,
                               ring.reshape(nb, block * nc))
            k01p = jnp.einsum("bik,bk->bi", k01, pc)
            fb = n0 - (k01p[:, :nc] + tails[:, :nc] + op_) * dt
            corr_base = k01p[:, nc:] + tails[:, nc:] + oc_
            f = (-(dyn_a @ q)).at[cids].add(fb.reshape(nb * nc))
            pthalf = p + f * (dt / 2)
            qtt = q + p * dt + f * (dt * dt / 2)
            cur = jnp.einsum("bc,bc->b", fb, pc)
            pf2 = -(dyn_a @ qtt)

            def bath_sum(pt):
                ptc = pt[cids].reshape(nb, nc)
                fl = n1 - (jnp.einsum("bik,bk->bi", k0, ptc)
                           + corr_base) * dt
                return pf2.at[cids].add(fl.reshape(nb * nc))

            ptt1 = pthalf + (dt / 2) * bath_sum(pthalf)
            ptt2 = (pthalf + (dt / 2) * bath_sum(ptt1)) * mask_a
            qtt = qtt * mask_a
            ring = jnp.roll(ring, 1, axis=1).at[:, 0].set(pc)
            return (ptt2, qtt, ring, n1), cur

        def outer(carry, xs_blk):
            p, q, hist, n0 = carry   # hist: (nb, ml-1, nc)
            hhat = jnp.fft.rfft(hist, n=nfft, axis=1)
            prod = jnp.einsum("bfij,bfj->bfi", khat,
                              jnp.conjugate(hhat))
            corr = jnp.fft.irfft(prod, n=nfft, axis=1)
            O = corr[:, 1:block + 2]
            xs_in = (xs_blk, jnp.swapaxes(O[:, :block], 0, 1),
                     jnp.swapaxes(O[:, 1:block + 1], 0, 1))
            ring = jnp.zeros((nb, block, nc), jnp.float32)
            (p, q, ring, n0), cur = jax.lax.scan(
                inner, (p, q, ring, n0), xs_in, length=block)
            hist = jnp.concatenate([ring, hist], axis=1)[:, : ml - 1]
            return (p, q, hist, n0), cur

        p0 = jnp.zeros((nph,), jnp.float32)
        q0 = jnp.zeros((nph,), jnp.float32)
        h0 = jnp.zeros((nb, ml - 1, nc), jnp.float32)
        (p, q, _, _), curs = jax.lax.scan(
            outer, (p0, q0, h0, nrow0), xs_outer, length=nblocks)
        return p, jnp.mean(curs, axis=(0, 1))

    noise = np.stack([np.asarray(baths[i].gnoi_np(7 + i).noise)
                      for i in range(nb)])
    kern_s = np.stack([np.asarray(b.kernel) for b in baths])
    f = jax.jit(segment)
    t0 = time.perf_counter()
    out = f(dyn, mask, kern_s, noise)
    jax.block_until_ready(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(dyn, mask, kern_s, noise)
        jax.block_until_ready(out)
    tr = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "tag": f"stacked single-traj block={block}",
        "compile_s": round(tc, 1),
        "us_per_step": round(tr / nmd * 1e6, 1),
        "steps_per_sec": round(nmd / tr, 1),
        "finite": bool(np.isfinite(np.asarray(out[1])).all()),
    }), flush=True)


if __name__ == "__main__":
    for b in ([int(x) for x in sys.argv[1].split(",")]
              if len(sys.argv) > 1 else [64, 128]):
        main(block=b)
