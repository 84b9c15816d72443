"""Current-induced-force (Lambda) pipeline.

Re-derivation of /root/reference/siesta-post/lambda.py: from electronic
structure (H, S, lead self-energies Sigma_L/R(E)) and e-ph coupling
matrices M_k, compute the Lambda correlation functions

    Lam^{ab}_{kl}(w) = 2 int dE/(4 pi^2)
        Tr[M_k A_a(E + w) M_l A_b(E)] (1 - n_F^a(E + w)) n_F^b(E)
        / n_B(mu_a - mu_b - w)

their equilibrium/nonequilibrium split, Hilbert partners, the phonon
retarded self-energy Pi^r(w), and the wideband current-induced-force
matrices eta (friction) / xim (nonconservative wind) / xip /
zeta1 (renormalisation) / zeta2 (Berry) consumed by the biased ebath
(sclmd_tpu.baths.ebath; reference baths.py:224-255).

Design decisions vs the reference:

* The per-mode-pair Python loops with eigen-truncated matmuls
  (cutA/cutM + LambdaFFT, lambda.py:801-950) become dense einsums + an
  FFT cross-correlation over the whole energy axis, CHUNKED over mode
  pairs so peak memory is (2*chunk) * ne * n^2 instead of the
  reference's rank-truncation bound (cutA/cutM are still provided for
  low-rank analysis parity).
* This is a SETUP-TIME tool, so it runs on the host in numpy by
  default (``backend="numpy"``) — consistent with the repo invariant
  that bath/pipeline setup never depends on device transfers (some TPU
  tunnels cannot move complex buffers off-device). ``backend="jax"``
  switches the heavy pieces (batched solves, correlations) to jnp for
  healthy accelerators.
* The reference's FFT branch calls ``myfft.iFourier1Dpad`` which does
  not exist in its own library (lambda.py:886 vs functions.py:11-53) —
  the zero-padding scheme is reconstructed here explicitly and
  validated against the direct-integration formula (``lambda_direct``,
  lambda.py:760-798) in the test suite.

Energy grids are "FFT-ordered": [0, dE, ..., Emax, -Emax, ..., -dE]
(lambda.py readHS:1593-1610). ``fft_order_grid`` builds one.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from sclmd_tpu.ops.functions import bose, fermi, nearest

SPIN = 2.0   # electron spin degeneracy (lambda.py:677,822)


def _get_xp(backend: str):
    if backend == "numpy":
        return np
    if backend == "jax":
        import jax.numpy as jnp
        return jnp
    raise ValueError(f"backend must be numpy|jax, got {backend}")


# ---------------------------------------------------------------------------
# grids
# ---------------------------------------------------------------------------
def fft_order_grid(emax: float, ne: int) -> np.ndarray:
    """FFT-ordered energy grid with ne (even) points, spacing
    2*emax/ne: [0 .. emax-dE, -emax .. -dE]."""
    ne = int(ne // 2) * 2
    de = 2.0 * emax / ne
    w = de * np.arange(ne)
    return np.where(w >= emax, w - ne * de, w)


def reord(a):
    """FFT order -> monotonic order (lambda.py:1761-1764)."""
    a = np.asarray(a)
    h = len(a) // 2
    return np.concatenate([a[h:], a[:h]], axis=0)


def trev(a, axis=0, xp=np):
    """a(t) -> a(-t) on a periodic grid: index 0 fixed, rest reversed
    (lambda.py:1286-1296)."""
    a = xp.asarray(a)
    return xp.roll(xp.flip(a, axis=axis), 1, axis=axis)


# ---------------------------------------------------------------------------
# eigen truncation utilities (parity with cutA/cutM, lambda.py:568-663)
# ---------------------------------------------------------------------------
def cutA(A, doscut: float):
    """Low-rank factor W of a PSD spectral matrix: A ~= W^T W^*,
    keeping eigenvalues > doscut * max (lambda.py:568-614)."""
    A = np.asarray(A)
    ev, Uv = np.linalg.eigh(A)
    order = np.argsort(-ev)
    ev, Uv = ev[order], Uv[:, order].T
    keep = max(int(np.sum(ev > ev.max() * doscut)), 1)
    return np.sqrt(np.clip(ev[:keep, None], 0, None)) * Uv[:keep]


def cutM(A, cut: float):
    """Signed eigen decomposition A ~= W^T diag(e) W^* keeping
    |e| >= cut * max|e| (lambda.py:617-663). Returns (e, W)."""
    A = np.asarray(A)
    ev, Uv = np.linalg.eigh(A)
    order = np.argsort(-ev)
    ev, Uv = ev[order], Uv[:, order].T
    keep = np.abs(ev) >= np.abs(ev).max() * cut
    if keep.sum() == 0:
        keep[:2] = True
    return ev[keep], Uv[keep]


# ---------------------------------------------------------------------------
# spectral functions
# ---------------------------------------------------------------------------
def spectral_functions(H, S, E, SigL, SigR, batch_size: int = 16,
                       backend: str = "numpy", keep_G: bool = True):
    """G(E), A_L, A_R, A, sym Re G, transmission over the grid.

    Mirrors calcALR (lambda.py:496-565) without eigen truncation:
    G = (E S - H - SigL - SigR)^-1; A_a = G Gamma_a G^dag;
    TR = Tr[A_L Gamma_R]. ``keep_G=False`` drops the raw Green's
    functions from the result (the pipeline itself never reads them).
    """
    H = np.asarray(H)
    S = np.asarray(S)
    SigL = np.asarray(SigL)
    SigR = np.asarray(SigR)
    E = np.asarray(E, dtype=float)

    if backend == "jax":
        import jax
        import jax.numpy as jnp

        def one(args):
            e, sl, sr = args
            gl = 1j * (sl - jnp.conjugate(sl.T))
            gr = 1j * (sr - jnp.conjugate(sr.T))
            g = jnp.linalg.inv(e * jnp.asarray(S) - jnp.asarray(H)
                               - sl - sr)
            gd = jnp.conjugate(g.T)
            al = g @ gl @ gd
            ar = g @ gr @ gd
            tr = jnp.trace(al @ gr)
            reg = 0.5 * (jnp.real(g) + jnp.real(g).T).astype(g.dtype)
            return g, al, ar, reg, jnp.real(tr)

        G, AL, AR, ReG, TR = jax.lax.map(
            one, (jnp.asarray(E), jnp.asarray(SigL), jnp.asarray(SigR)),
            batch_size=batch_size)
        G, AL, AR, ReG, TR = (np.asarray(x) for x in (G, AL, AR, ReG, TR))
    else:
        ne, n = len(E), H.shape[0]
        G = np.empty((ne, n, n), complex)
        AL = np.empty_like(G)
        AR = np.empty_like(G)
        ReG = np.empty_like(G)
        TR = np.empty(ne)
        for i in range(ne):
            sl, sr = SigL[i], SigR[i]
            gl = 1j * (sl - sl.conj().T)
            gr = 1j * (sr - sr.conj().T)
            g = np.linalg.inv(E[i] * S - H - sl - sr)
            gd = g.conj().T
            G[i] = g
            AL[i] = g @ gl @ gd
            AR[i] = g @ gr @ gd
            ReG[i] = 0.5 * (g.real + g.real.T)
            TR[i] = np.real(np.trace(AL[i] @ gr))

    out = {"AL": AL, "AR": AR, "A": AL + AR, "ReG": ReG, "TR": TR,
           "ALtr": np.real(np.trace(AL, axis1=1, axis2=2)),
           "ARtr": np.real(np.trace(AR, axis1=1, axis2=2))}
    if keep_G:
        out["G"] = G
    return out


# ---------------------------------------------------------------------------
# MAMA products
# ---------------------------------------------------------------------------
def _pair_mask(hw, hwcut: float):
    """(nm, nm) mask: |hw_k - hw_l| <= hwcut and both modes positive
    (lambda.py:729-737)."""
    hw = np.asarray(hw)
    m = (np.abs(hw[:, None] - hw[None, :]) <= hwcut) \
        & (hw[:, None] >= 0) & (hw[None, :] >= 0)
    return m


def mama_single(M, Aa, Ab, mask, spin: float = SPIN,
                herm_mode: str = "tril", xp=np):
    """(MAaMAb)_{kl} = spin Tr[M_k Aa M_l Ab] with mask + Hermitian fill.

    herm_mode: "tril" fills the upper triangle from the conjugated lower
    one (the reference's herm(), lambda.py:1797-1811); "sym" uses the
    linear 0.5 (X + X^dag) (commutes with energy integration — used for
    FFT/direct cross-checks); None returns the raw trace matrix.
    """
    M = xp.asarray(M)
    X = xp.einsum("kpq,qr->kpr", M, xp.asarray(Aa))
    Y = xp.einsum("lrs,sp->lrp", M, xp.asarray(Ab))
    out = xp.einsum("kpr,lrp->kl", X, Y)
    out = xp.where(xp.asarray(mask), out, 0.0)
    if herm_mode == "tril":
        out = xp.tril(out, -1) + xp.conjugate(xp.tril(out, -1)).T \
            + xp.diag(xp.real(xp.diag(out)).astype(out.dtype))
    elif herm_mode == "sym":
        out = 0.5 * (out + xp.conjugate(out.T))
    return spin * out


# ---------------------------------------------------------------------------
# FFT cross-correlation over the energy axis
# ---------------------------------------------------------------------------
def _pad_middle(a, npad: int, axis: int, xp):
    """Insert npad zeros at the high-|E| midpoint of an FFT-ordered axis."""
    n = a.shape[axis]
    h = n // 2
    a0 = xp.moveaxis(a, axis, 0)
    z = xp.zeros((npad,) + a0.shape[1:], a.dtype)
    out = xp.concatenate([a0[:h], z, a0[h:]], axis=0)
    return xp.moveaxis(out, 0, axis)


def _unpad_middle(a, npad: int, axis: int, xp):
    n = a.shape[axis]
    h = (n - npad) // 2
    a0 = xp.moveaxis(a, axis, 0)
    out = xp.concatenate([a0[:h], a0[h + npad:]], axis=0)
    return xp.moveaxis(out, 0, axis)


def energy_correlation(u, v, npad: Optional[int] = None, xp=np):
    """C_{kl}(w) = sum_{E} <u_k(E + w), v_l(E)> for FFT-ordered fields.

    u, v: (nmu, ne, d) / (nmv, ne, d) complex. Computed as
    fft/product/ifft with middle zero-padding to suppress wrap-around;
    returns (nmu, nmv, ne).
    """
    u = xp.asarray(u)
    v = xp.asarray(v)
    ne = u.shape[1]
    npad = (ne // 2) * 2 if npad is None else npad
    up = _pad_middle(u, npad, 1, xp)
    vp = _pad_middle(v, npad, 1, xp)
    # w -> t (exponent e^{-2pi i j t/N} convention: plain fft)
    ut = xp.fft.fft(up, axis=1)
    vt = xp.fft.fft(vp, axis=1)
    vtr = trev(vt, axis=1, xp=xp)             # v(-t)
    prod = xp.einsum("ktd,ltd->klt", ut, vtr)
    # t -> w with 1/N (ifft) giving exactly sum_E u(E+w) v(E)
    corr = xp.fft.ifft(prod, axis=2)
    return _unpad_middle(corr, npad, 2, xp)


def _mode_fields(M, Aw, weight=None, xp=np):
    """u_k(E) = flatten(M_k @ A(E) * weight(E)): (nm, ne, n^2)."""
    M = xp.asarray(M)
    Aw = xp.asarray(Aw)
    X = xp.einsum("kpq,eqr->kepr", M, Aw)
    if weight is not None:
        X = X * xp.asarray(weight)[None, :, None, None]
    nm, ne, n, _ = X.shape
    return X.reshape(nm, ne, n * n)


def _mode_fields_T(M, Aw, weight=None, xp=np):
    """v_l(E) = flatten((M_l @ A(E))^T) so <u_k, v_l> = Tr[...]."""
    M = xp.asarray(M)
    Aw = xp.asarray(Aw)
    X = xp.einsum("lrs,esp->lerp", M, Aw)
    if weight is not None:
        X = X * xp.asarray(weight)[None, :, None, None]
    nm, ne, n, _ = X.shape
    return xp.swapaxes(X, 2, 3).reshape(nm, ne, n * n)


def chunked_correlation(M, Aw_u, Aw_v, wu, wv, mode_chunk: int,
                        xp=np) -> np.ndarray:
    """Blocked C_{kl}(w): builds the (chunk, ne, n^2) mode fields per
    block so peak memory is 2 * mode_chunk * ne * n^2 complex instead of
    2 * nm * ne * n^2 (the dense route OOMs at production junction
    sizes; the reference bounded this with eigen truncation instead).
    """
    nm = M.shape[0]
    ne = Aw_u.shape[0]
    out = np.empty((nm, nm, ne), complex)
    for i0 in range(0, nm, mode_chunk):
        iu = slice(i0, min(i0 + mode_chunk, nm))
        u = _mode_fields(M[iu], Aw_u, weight=wu, xp=xp)
        for j0 in range(0, nm, mode_chunk):
            jv = slice(j0, min(j0 + mode_chunk, nm))
            v = _mode_fields_T(M[jv], Aw_v, weight=wv, xp=xp)
            out[iu, jv] = np.asarray(energy_correlation(u, v, xp=xp))
    return out


# ---------------------------------------------------------------------------
# Lambda functions
# ---------------------------------------------------------------------------
class LambdaPipeline:
    """Orchestrates the Lambda computation for one junction.

    Parameters
    ----------
    H, S : (n, n) device Hamiltonian / overlap (eV).
    E : (ne,) FFT-ordered energy grid (use fft_order_grid).
    SigL, SigR : (ne, n, n) retarded lead self-energies on the grid.
    M : (nm, n, n) e-ph coupling dH/dQ in mass-normalised coordinates
        (Hermitised, * sqrt(2 hw) — ReadEph convention lambda.py:1633-1641).
    hw : (nm,) phonon mode energies (eV).
    Umodes : optional (nm, nph) mode->real-space transform (ReadDynmat).
    backend : "numpy" (host, default — this is setup-time tooling) or
        "jax" for the heavy linear algebra on an accelerator.
    mode_chunk : block size for the mode-pair correlation memory bound.
    """

    def __init__(self, H, S, E, SigL, SigR, M, hw, Umodes=None,
                 T: float = 0.0, spin: float = SPIN, batch_size: int = 16,
                 backend: str = "numpy", mode_chunk: int = 8):
        self.xp = _get_xp(backend)
        self.backend = backend
        self.mode_chunk = int(mode_chunk)
        self.H, self.S = np.asarray(H), np.asarray(S)
        self.E = np.asarray(E, dtype=float)
        self.de = float(np.abs(self.E[1] - self.E[0]))
        self.SigL, self.SigR = np.asarray(SigL), np.asarray(SigR)
        self.M = np.asarray(M)
        self.hw = np.asarray(hw)
        self.Umodes = None if Umodes is None else np.asarray(Umodes)
        self.T = float(T)
        self.spin = spin
        self.sp = spectral_functions(self.H, self.S, self.E,
                                     self.SigL, self.SigR, batch_size,
                                     backend=backend, keep_G=False)

    # -- raw MAMA at chosen energies ---------------------------------------
    def _A(self, which):
        return {"L": self.sp["AL"], "R": self.sp["AR"],
                "A": self.sp["A"]}[which]

    def mama(self, w1, w2, a, b, hwcut, herm_mode: str = "tril"):
        """spin Tr[M_k A_a(w1) M_l A_b(w2)] (calcMAMA)."""
        i1, i2 = nearest(w1, self.E), nearest(w2, self.E)
        mask = _pair_mask(self.hw, hwcut)
        return np.asarray(mama_single(
            self.M, self._A(a)[i1], self._A(b)[i2], mask,
            self.spin, herm_mode=herm_mode, xp=self.xp))

    # -- direct integration (oracle; Lambda, lambda.py:760-798) ------------
    def lambda_direct(self, w, a, b, mua, mub, dw, maxw, hwcut,
                      herm_mode: str = "tril"):
        nm = len(self.hw)
        if w < 0 or w > maxw:
            return np.zeros((nm, nm), complex)
        lo, hi = min(mua - w, mub), max(mua - w, mub)
        if lo == hi:
            return np.zeros((nm, nm), complex)
        nw = int(np.floor((hi - lo) / dw) + 1)
        wl = [(hi + lo) / 2] if nw == 1 else \
            [lo + (hi - lo) * i / (nw - 1) for i in range(nw)]
        acc = np.mean([self.mama(x + w, x, a, b, hwcut,
                                 herm_mode=herm_mode) for x in wl],
                      axis=0)
        return (mua - mub - w) / 4 / np.pi ** 2 * acc

    # -- FFT Lambda (LambdaFFT, lambda.py:801-950) -------------------------
    def lambda_fft(self, a, b, mua, mub, hwcut):
        E = self.E
        fa = 1.0 - np.asarray(fermi(E, mua, self.T, xp=np))
        fb = np.asarray(fermi(E, mub, self.T, xp=np))
        corr = chunked_correlation(self.M, np.asarray(self._A(a)),
                                   np.asarray(self._A(b)), fa, fb,
                                   self.mode_chunk, xp=self.xp)
        lam = np.moveaxis(corr, 2, 0) * (self.de / (2 * np.pi) ** 2) \
            * self.spin
        # Hermitian structure in mode space + hwcut mask
        mask = _pair_mask(self.hw, hwcut)
        lam = np.where(mask[None], lam, 0.0)
        lam = 0.5 * (lam + np.conjugate(np.swapaxes(lam, 1, 2)))
        # detailed-balance division (lambda.py:944-948)
        denom = np.asarray(bose(mua - mub - E, self.T, xp=np))
        keep = (mua - mub - E) < 0.0
        lam = np.where(keep[:, None, None],
                       lam / np.where(keep, denom, 1.0)[:, None, None],
                       0.0)
        return lam

    # -- equilibrium part (EquLambdaFFT, lambda.py:953-1081) ---------------
    def equ_lambda_fft(self, hwcut, mu0: float = 0.0):
        E = self.E
        f0 = np.asarray(fermi(E, mu0, self.T, xp=np))
        A = np.asarray(self.sp["A"])
        c1 = chunked_correlation(self.M, A, A, f0, None,
                                 self.mode_chunk, xp=self.xp)
        # second term u(-t)v(t): sum_E u(E) v(E+w) = C_vu[l,k](w), built
        # from the role-swapped correlation (the f0 weight stays on the
        # u-field, which now sits in the static slot)
        c2 = np.swapaxes(self._corr_swapped(A, A, f0, None), 0, 1)
        lam = np.moveaxis(c1 - c2, 2, 0)
        lam = lam * (self.de / (2 * np.pi) ** 2) * self.spin
        mask = _pair_mask(self.hw, hwcut)
        lam = np.where(mask[None], lam, 0.0)
        # real symmetric in mode space (lambda.py:1064-1066)
        lam = np.real(lam)
        lam = 0.5 * (lam + np.swapaxes(lam, 1, 2))
        return lam

    def _corr_swapped(self, Aw_u, Aw_v, wu, wv):
        """C_vu: correlation with the v-field leading (u_k built with
        _mode_fields_T semantics on the second slot)."""
        nm = self.M.shape[0]
        ne = Aw_u.shape[0]
        out = np.empty((nm, nm, ne), complex)
        ch = self.mode_chunk
        for i0 in range(0, nm, ch):
            iu = slice(i0, min(i0 + ch, nm))
            u = _mode_fields_T(self.M[iu], Aw_v, weight=wv, xp=self.xp)
            for j0 in range(0, nm, ch):
                jv = slice(j0, min(j0 + ch, nm))
                v = _mode_fields(self.M[jv], Aw_u, weight=wu, xp=self.xp)
                # note: u here plays the "shifted" role
                out[iu, jv] = np.asarray(
                    energy_correlation(u, v, xp=self.xp))
        return out

    # -- nonequilibrium part (NonequLambdaFFT, lambda.py:1084-1283) --------
    def nonequ_lambda_fft(self, hwcut, muL, muR, mu0: float = 0.0):
        E = self.E
        dfL = np.asarray(fermi(E, muL, self.T, xp=np)) - \
            np.asarray(fermi(E, mu0, self.T, xp=np))
        dfR = np.asarray(fermi(E, muR, self.T, xp=np)) - \
            np.asarray(fermi(E, mu0, self.T, xp=np))
        # u = M (AL dfL + AR dfR): build the weighted combined field once
        Au = (np.asarray(self.sp["AL"]) * dfL[:, None, None]
              + np.asarray(self.sp["AR"]) * dfR[:, None, None])
        A = np.asarray(self.sp["A"])
        c1 = np.moveaxis(chunked_correlation(
            self.M, Au, A, None, None, self.mode_chunk, xp=self.xp), 2, 0)
        c2 = np.moveaxis(np.swapaxes(
            self._corr_swapped(Au, A, None, None), 0, 1), 2, 0)
        pref = (self.de / (2 * np.pi) ** 2) * self.spin
        mask = _pair_mask(self.hw, hwcut)[None]

        diff = (c1 - c2) * pref
        summ = (c1 + c2) * pref
        lam = 0.5 * (np.real(diff) + np.swapaxes(np.real(diff), 1, 2)) \
            + 0.5j * (np.imag(summ) - np.swapaxes(np.imag(summ), 1, 2))
        lam = np.where(mask, lam, 0.0)

        # Hilbert partner with sym Re G in place of A; H{A} = -2 Re G
        # carries an extra factor 2 (lambda.py:1276-1278)
        ReG = np.asarray(self.sp["ReG"]).astype(complex)
        h1 = np.moveaxis(chunked_correlation(
            self.M, Au, ReG, None, None, self.mode_chunk, xp=self.xp),
            2, 0)
        h2 = np.moveaxis(np.swapaxes(
            self._corr_swapped(Au, ReG, None, None), 0, 1), 2, 0)
        prefH = (self.de / (2 * np.pi) ** 2) * 2.0 * self.spin
        diffH = (h1 - h2) * prefH
        summH = (h1 + h2) * prefH
        hlam = 0.5 * (np.real(summH) + np.swapaxes(np.real(summH), 1, 2)) \
            + 0.5j * (np.imag(diffH) - np.swapaxes(np.imag(diffH), 1, 2))
        hlam = np.where(mask, hlam, 0.0)
        return lam, hlam

    # -- wideband matrices (wbLambda, lambda.py:1299-1436) -----------------
    def wideband(self, hwcut, mu0: float = 0.0):
        MLL = self.mama(mu0, mu0, "L", "L", hwcut)
        MRR = self.mama(mu0, mu0, "R", "R", hwcut)
        MLR = self.mama(mu0, mu0, "L", "R", hwcut)
        MRL = self.mama(mu0, mu0, "R", "L", hwcut)
        eta = np.real(MLL + MRR + MLR + MRL) / 4 / np.pi
        xim = np.imag(MLR) / 2 / np.pi
        xip = np.real(MLR) / 2 / np.pi

        # zeta1 / zeta2 from Tr[M (AL - AR) M ReG] and the dReG/dE
        # variant at mu0 (lambda.py:1336-1364)
        iw = nearest(mu0, self.E)
        iwp = nearest(self.E[iw] + self.de, self.E)
        iwm = nearest(self.E[iw] - self.de, self.E)
        if iwp == iw or iwm == iw:
            raise ValueError(
                f"wideband: mu0={mu0} sits at the energy-grid edge "
                f"(E[iw]={self.E[iw]:.6g}); the dReG/dE finite "
                "difference needs both neighbors — enlarge emax or "
                "shift mu0")
        denomE = self.E[iwp] - self.E[iwm]
        dAm = np.asarray(self.sp["AL"][iw] - self.sp["AR"][iw])
        ReG = np.asarray(self.sp["ReG"][iw]).astype(complex)
        dReG = ((np.asarray(self.sp["ReG"][iwp])
                 - np.asarray(self.sp["ReG"][iwm])) / denomE
                ).astype(complex)
        mask = _pair_mask(self.hw, hwcut)

        Xa = np.einsum("kpq,qr->kpr", self.M, dAm)
        Yb = np.einsum("lrs,sp->lrp", self.M, ReG)
        Yc = np.einsum("lrs,sp->lrp", self.M, dReG)
        z1 = np.real(np.einsum("kpr,lrp->kl", Xa, Yb)) / np.pi
        z2 = np.imag(np.einsum("kpr,lrp->kl", Xa, Yc)) / np.pi
        z1 = np.where(mask, z1, 0.0)
        z2 = np.where(mask, z2, 0.0)
        zeta1 = np.tril(z1) + np.tril(z1, -1).T
        zeta2 = np.tril(z2, -1) - np.tril(z2, -1).T   # antisym, zero diag

        out = {"eta": eta, "xim": xim, "xip": xip,
               "zeta1": zeta1, "zeta2": zeta2}
        if self.Umodes is not None:
            Um = self.Umodes
            for k in list(out):
                out[k + "_r"] = Um.T @ out[k] @ Um
        return out

    # -- full Lambda + Pi^r ------------------------------------------------
    def full_lambda(self, hwcut, muL, muR, mu0: float = 0.0):
        LamLL = self.lambda_fft("L", "L", muL, muL, hwcut)
        LamRR = self.lambda_fft("R", "R", muR, muR, hwcut)
        LamLR = self.lambda_fft("L", "R", muL, muR, hwcut)
        LamRL = self.lambda_fft("R", "L", muR, muL, hwcut)
        LamLL, LamRR, LamLR, LamRL = domapping(
            self.E, muL, muR, LamLL, LamRR, LamLR, LamRL)
        LamEqu = self.equ_lambda_fft(hwcut, mu0)
        LamNon, LamHNon = self.nonequ_lambda_fft(hwcut, muL, muR, mu0)
        Lam = LamLL + LamRR + LamLR + LamRL
        Pir = pir_from_pira(self.E, 2.0 * np.pi * 1j * Lam)
        Pir2 = 1j * np.pi * (LamEqu + LamNon - 1j * LamHNon)
        return {"wl": self.E, "LamLL": LamLL, "LamRR": LamRR,
                "LamLR": LamLR, "LamRL": LamRL, "LamEqu": LamEqu,
                "LamNon": LamNon, "LamHNon": LamHNon,
                "Pir": Pir, "Pir2": Pir2, "TR": np.asarray(self.sp["TR"])}

    def write(self, outfile, hwcut, muL, muR, mu0=0.0):
        """Compute everything and write a Lambda bundle (npz or NetCDF)
        readable by utils.io.ReadLambda (main(), lambda.py:295-352)."""
        from sclmd_tpu.utils.io import _write_vars
        wb = self.wideband(hwcut, mu0)
        full = self.full_lambda(hwcut, muL, muR, mu0)
        E_m = reord(full["wl"])
        arrays = {"wl": E_m, "muLR": np.array([muL, muR]),
                  "T": np.array([self.T]),
                  "trans": reord(full["TR"]),
                  "AL": reord(np.asarray(self.sp["ALtr"])),
                  "AR": reord(np.asarray(self.sp["ARtr"]))}
        for k in ("LamLL", "LamRR", "LamLR", "LamRL", "LamEqu",
                  "LamNon", "LamHNon", "Pir", "Pir2"):
            v = reord(full[k])
            arrays["Re" + k] = v.real
            arrays["Im" + k] = v.imag
        for k, v in wb.items():
            arrays[k] = v
        _write_vars(outfile, arrays)
        return full, wb


def domapping(E, fermiL, fermiR, LamLL, LamRR, LamLR, LamRL):
    """Negative-frequency completion by Lam^{ab}(w) = -Lam^{ba}(-w)^T
    (lambda.py:468-490)."""
    E = np.asarray(E)
    out = [np.array(LamLL), np.array(LamRR),
           np.array(LamLR), np.array(LamRL)]
    for i in range(len(E)):
        ir = nearest(-E[i], E)
        if E[i] < 0:
            out[0][i] = -np.transpose(LamLL[ir])
            out[1][i] = -np.transpose(LamRR[ir])
        if E[i] < fermiL - fermiR:
            out[2][i] = -np.transpose(LamRL[ir])
        if E[i] < fermiR - fermiL:
            out[3][i] = -np.transpose(LamLR[ir])
    return out


def pir_from_pira(E, Pira):
    """Retarded Pi^r from Pi^r - Pi^a: FFT to time, zero negative times,
    halve t=0, FFT back (lambda.py:244-271), with exponentially decaying
    middle padding."""
    Pira = np.asarray(Pira)
    nf = len(E)
    npad = (nf // 2) * 2
    nm = Pira.shape[-1]
    # decaying pad rows anchored on the grid-edge values
    pad = np.zeros((npad, nm, nm), complex)
    for i in range(npad // 2):
        pad[i] = np.conjugate(Pira[nf // 2]) * \
            np.exp(-i / (npad / 2 / 10.0))
        pad[npad - 1 - i] = Pira[nf // 2] * np.exp(-(i + 1) /
                                                   (npad / 2 / 10.0))
    Pp = np.concatenate([Pira[: nf // 2], pad, Pira[nf // 2:]], axis=0)
    nfft = nf + npad
    # w -> t in the physics convention f(t) = int dw/2pi X(w) e^{-iwt}
    # (discrete: plain fft, as myfft.iFourier1D); indices >= nfft/2 are
    # then NEGATIVE times. Constants cancel in the round trip.
    tmp = np.fft.fft(Pp, axis=0)
    tmp[nfft // 2:] = 0.0
    tmp[0] *= 0.5
    back = np.fft.ifft(np.real(tmp), axis=0)
    return np.concatenate([back[: nf // 2], back[nf // 2 + npad:]], axis=0)


# ---------------------------------------------------------------------------
# bias-dependent mode analysis
# ---------------------------------------------------------------------------
def eigenanalysis(Vmax, nlen, hw, eta, xim, zeta1, zeta2):
    """Bias-dependent complex phonon modes from the first-order companion
    matrix (lambda.py:1441-1488). Returns (blist, invQ (nlen, nm),
    nhw (nlen, nm))."""
    hw = np.asarray(hw)
    nm = len(hw)
    dynmat = np.diag(hw ** 2)
    blist = Vmax * np.arange(nlen) / nlen
    invQs = np.zeros((nlen, nm))
    nhws = np.zeros((nlen, nm))
    for j, tb in enumerate(blist):
        tmat = np.zeros((2 * nm, 2 * nm))
        tmat[:nm, :nm] = -eta - tb * zeta2
        tmat[:nm, nm:] = -dynmat + tb * xim - tb * zeta1
        tmat[nm:, :nm] = np.identity(nm)
        evs = np.linalg.eigvals(tmat)
        sel = evs[evs.imag < 0]
        sel = sel[np.argsort(sel.imag)][::-1][:nm] \
            if len(sel) >= nm else np.pad(sel, (0, nm - len(sel)))
        invQs[j, : len(sel)] = np.where(sel.imag != 0,
                                        2 * sel.real / sel.imag, 0.0)
        nhws[j, : len(sel)] = -sel.imag
    return blist, invQs, nhws


def joule_heating(Vmax, nlen, hw, eta, xim, xip, zeta1, zeta2, T=4.2):
    """Bias-induced steady-state phonon occupation (lambda.py:1491-1526):
    n(V) = n_B(hw) + [cof+ + cof-] xip_jj / (2 hw eta_jj). Fully
    vectorised over (bias, mode)."""
    hw = np.asarray(hw, float)
    nm = len(hw)
    eta_d = np.diag(np.asarray(eta))
    xip_d = np.diag(np.asarray(xip))
    blist = Vmax * np.arange(nlen) / nlen
    hb = hw[None, :]                                 # (1, nm)
    tb = blist[:, None]                              # (nlen, 1)
    n0 = np.asarray(bose(hw, T, xp=np))[None, :]
    cofp = (hb + tb) * (np.asarray(bose(hb + tb, T, xp=np)) - n0)
    cofm = (hb - tb) * (np.asarray(bose(hb - tb, T, xp=np)) - n0)
    ok = (hb > 0) & (eta_d[None, :] > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        nph = np.where(
            ok, (cofp + cofm) * xip_d[None, :]
            / np.where(hb > 0, hb, 1.0)
            / np.where(eta_d[None, :] > 0, eta_d[None, :], 1.0) / 2
            + n0, 0.0)
    return blist, nph


def prepare_eph_matrices(Mraw, hw):
    """Hermitise + sqrt(2 hw) normalisation of raw Inelastica He_ph
    (ReadEph, lambda.py:1633-1641): M = sym(M) * sqrt(2 hw) for hw > 0,
    zero otherwise."""
    Mraw = np.asarray(Mraw)
    hw = np.asarray(hw)
    out = np.zeros_like(Mraw, dtype=complex)
    for i in range(len(hw)):
        h = 0.5 * (Mraw[i] + np.conjugate(Mraw[i].T))
        out[i] = h * np.sqrt(2 * hw[i]) if hw[i] > 0 else 0.0
    return out
