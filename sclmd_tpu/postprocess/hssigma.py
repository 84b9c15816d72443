"""Real-space lead self-energy extraction (HSSigma), batched.

Equivalent of /root/reference/siesta-post/hssigma.py: given per-k-point
device Hamiltonians/overlaps and pivoted lead self-energies (from a
TranSiesta/tbtrans run), produce the k-averaged REAL-SPACE self-energies
consumed by the Lambda pipeline:

    Gbar_x(E)  = sum_k w_k (G_x(E,k) + G_x(E,k)^T)/2    (time reversal)
    Sigma_x(E) = (E + i eta) Sbar - Hbar - Gbar_x(E)^{-1}

for x in {L, R, tot}, plus transmission diagnostics (hssigma.py:252-418).

The reference is a serial script over (energy x k) with one dense
inverse per step; here the k loop is a vmap and energies are chunked
with lax.map — one compiled program per sweep. File ingestion from
sisl/TSHS is gated (sisl is not in this image); arrays go in/out via
sclmd_tpu.utils.io (npz or NetCDF).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def expand_pivoted_sigma(SFE, pivot, n: int):
    """Scatter a pivoted (np, np) self-energy block into the full
    (n, n) orbital space (hssigma.py:233-241). ``pivot`` holds the full-
    space orbital index of each pivoted row. Batched over leading axes.
    """
    SFE = np.asarray(SFE)
    pivot = np.asarray(pivot, dtype=np.int64)
    out_shape = SFE.shape[:-2] + (n, n)
    out = np.zeros(out_shape, dtype=complex)
    out[..., pivot[:, None], pivot[None, :]] = SFE
    return out


def kaverage_extract(Hk, Sk, SigLk, SigRk, E, wk, eta: float = 1e-4,
                     batch_size: int = 8):
    """k-averaged real-space self-energies over an energy grid.

    Parameters
    ----------
    Hk, Sk : (nk, n, n) device Hamiltonian/overlap per k-point (eV).
    SigLk, SigRk : (ne, nk, n, n) lead self-energies per energy/k.
    E : (ne,) energies (eV); wk : (nk,) k weights (sum to 1).
    eta : imaginary broadening (eV) — NOT included in the input SFE
          (hssigma.py:125).

    Returns dict with Hbar, Sbar, SigmaL, SigmaR, SigmaTOT (ne, n, n),
    and transmissions T_k (ne, nk), T_rs (ne) computed from the
    real-space matrices.
    """
    Hk = jnp.asarray(Hk)
    Sk = jnp.asarray(Sk)
    SigLk = jnp.asarray(SigLk)
    SigRk = jnp.asarray(SigRk)
    E = jnp.asarray(np.asarray(E, float))
    wk = jnp.asarray(np.asarray(wk, float))

    # TRS-symmetrised k-averaged H, S (energy independent)
    def trs_avg(Xk):
        sym = 0.5 * (Xk + jnp.swapaxes(Xk, -1, -2))
        return jnp.einsum("k,kij->ij", wk, sym)

    Hbar = trs_avg(Hk)
    Sbar = trs_avg(Sk)

    def one_energy(args):
        e, sl_k, sr_k = args
        z = e + 1j * eta

        def per_k(h, s, sl, sr):
            invG = z * s - h - sl - sr
            invGL = z * s - h - sl
            invGR = z * s - h - sr
            G = jnp.linalg.inv(invG)
            GL = jnp.linalg.inv(invGL)
            GR = jnp.linalg.inv(invGR)
            gamL = 1j * (sl - jnp.conjugate(jnp.swapaxes(sl, -1, -2)))
            gamR = 1j * (sr - jnp.conjugate(jnp.swapaxes(sr, -1, -2)))
            Tk = jnp.real(jnp.trace(
                gamR @ G @ gamL @ jnp.conjugate(G.T)))
            return G, GL, GR, Tk

        G, GL, GR, Tk = jax.vmap(per_k)(Hk, Sk, sl_k, sr_k)

        def trs_sum(Xk):
            return jnp.einsum("k,kij->ij",
                              wk, 0.5 * (Xk + jnp.swapaxes(Xk, -1, -2)))

        Gbar, GLbar, GRbar = trs_sum(G), trs_sum(GL), trs_sum(GR)
        HSsum = z * Sbar - Hbar
        SigTOT = HSsum - jnp.linalg.inv(Gbar)
        SigL = HSsum - jnp.linalg.inv(GLbar)
        SigR = HSsum - jnp.linalg.inv(GRbar)

        # real-space transmission check (hssigma.py:398-409)
        gamL = 1j * (SigL - jnp.conjugate(SigL.T))
        gamR = 1j * (SigR - jnp.conjugate(SigR.T))
        Grs = jnp.linalg.inv(HSsum - SigL - SigR)
        Trs = jnp.real(jnp.trace(gamR @ Grs @ gamL @ jnp.conjugate(Grs.T)))
        return SigL, SigR, SigTOT, Tk, Trs

    SigL, SigR, SigTOT, Tks, Trs = jax.lax.map(
        one_energy, (E, SigLk, SigRk), batch_size=batch_size)
    return {"Hbar": np.asarray(Hbar), "Sbar": np.asarray(Sbar),
            "SigmaL": np.asarray(SigL), "SigmaR": np.asarray(SigR),
            "SigmaTOT": np.asarray(SigTOT),
            "T_k": np.asarray(Tks), "T_rs": np.asarray(Trs)}


def write_hssigma_mean(outfile, E, result, eta: float = 1e-4,
                       kpts=None):
    """Write an HSSigmaMEAN bundle consumable by the Lambda pipeline
    (readHS variable names, lambda.py:1542-1612)."""
    from sclmd_tpu.utils.io import _write_vars
    arrays = {
        "ReE": np.asarray(E), "ImE": np.full(len(E), eta),
        "ReH": result["Hbar"].real, "ImH": result["Hbar"].imag,
        "ReS": result["Sbar"].real, "ImS": result["Sbar"].imag,
        "ReSigmaL": result["SigmaL"].real,
        "ImSigmaL": result["SigmaL"].imag,
        "ReSigmaR": result["SigmaR"].real,
        "ImSigmaR": result["SigmaR"].imag,
        "ReSigmaTOT": result["SigmaTOT"].real,
        "ImSigmaTOT": result["SigmaTOT"].imag,
        "Trans": result["T_rs"],
    }
    if kpts is not None:
        arrays["kpts"] = np.asarray(kpts)
    _write_vars(outfile, arrays)


def read_hssigma_mean(filename):
    """Read an HSSigmaMEAN bundle into (E, H, S, SigL, SigR) with the
    FFT-order rearrangement of readHS (lambda.py:1593-1610)."""
    from sclmd_tpu.utils.io import _open_vars
    from sclmd_tpu.ops.functions import nearest
    v = _open_vars(filename)
    En = np.asarray(v["ReE"])
    H = v["ReH"] + 1j * v.get("ImH", 0.0 * v["ReH"])
    S = v["ReS"] + 1j * v.get("ImS", 0.0 * v["ReS"])
    Sig1 = v["ReSigmaL"] + 1j * v["ImSigmaL"]
    Sig2 = v["ReSigmaR"] + 1j * v["ImSigmaR"]
    dw = En[1] - En[0]
    nw = int(len(En) / 2) * 2
    E = np.zeros(nw)
    S1 = np.zeros((nw,) + Sig1.shape[1:], complex)
    S2 = np.zeros((nw,) + Sig2.shape[1:], complex)
    for i in range(nw):
        w = dw * i
        if w >= dw * nw / 2:
            w = w - nw * dw
        iw = nearest(w, En)
        E[i] = w
        S1[i] = Sig1[iw]
        S2[i] = Sig2[iw]
    return E, H, S, S1, S2
