"""End-to-end physics cross-check: GLE MD vs NEGF Landauer transport.

The reference validates itself by computing the same junction's thermal
conductance two independent ways (examples/runmd.py vs examples/runnegf.py,
README.md:31-35). Here: a harmonic chain with two wideband quantum baths —
the MD ensemble's steady-state heat current must match the ballistic
Landauer integral with Bose occupations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sclmd_tpu import baths as B
from sclmd_tpu import units as U
from sclmd_tpu.md import initial_state, run_segment
from sclmd_tpu.negf import landauer_current_natural
from sclmd_tpu.models.harmonic import chain_dynmat
from tests.test_md import make_system


def negf_current_natural(dyn, eta, bathL, bathR, TL, TR, nw=2000,
                         wmax=1.0):
    """Dense Caroli transmission in natural units + Landauer integral."""
    dyn = np.asarray(dyn)
    nd = len(dyn)
    ws = np.linspace(0, wmax, nw + 1)[1:]
    tm = []
    for w in ws:
        se = np.zeros((nd, nd), complex)
        for i in bathL:
            se[i, i] += -1j * w * eta
        for i in bathR:
            se[i, i] += -1j * w * eta
        g = np.linalg.inv((w + 1e-9j) ** 2 * np.eye(nd) - dyn - se)
        gl = np.zeros((nd, nd))
        gr = np.zeros((nd, nd))
        for i in bathL:
            gl[i, i] = 2 * w * eta
        for i in bathR:
            gr[i, i] = 2 * w * eta
        tm.append(np.real(np.trace(g @ gl @ g.conj().T @ gr)))
    return float(landauer_current_natural(ws, np.array(tm), TL, TR))


@pytest.mark.slow
def test_md_conductance_matches_negf(key):
    """Quantum GLE heat current == Landauer integral within stat error."""
    nph = 8
    k_spring = 0.04                  # band top 2 sqrt(k) = 0.4 eV
    dt = 0.25 / 0.658
    nmd = 2 ** 14
    T, delta = 300.0, 0.5
    TL, TR = T * (1 + delta / 2), T * (1 - delta / 2)
    eta = 1.0 / (50 / 0.658)         # coupling strength

    dyn = np.asarray(chain_dynmat(nph, k_spring))
    bathL, bathR = [0], [nph - 1]

    ebl = B.ebath(bathL, TL, dt, nmd, wmax=1.0, efric=np.eye(1) * eta,
                  dtype=jnp.float64)
    ebr = B.ebath(bathR, TR, dt, nmd, wmax=1.0, efric=np.eye(1) * eta,
                  dtype=jnp.float64)

    # ensemble of independent runs, vmapped over noise realisations
    nens = 8
    keys = jax.random.split(key, (nens, 2))

    def one(ks):
        sysb = make_system(dyn, [ebl.gnoi(ks[0]), ebr.gnoi(ks[1])],
                           dt, nmd)
        st = initial_state(sysb, dtype=jnp.float64)
        _, ys = run_segment(sysb, st, nmd)
        cur = ys["cur"][nmd // 4:]
        return jnp.mean(cur[:, 0]), jnp.mean(cur[:, 1])

    jl, jr = jax.vmap(one)(keys)
    j_md = float(jnp.mean((jl - jr) / 2))
    j_err = float(jnp.std((jl - jr) / 2) / np.sqrt(nens))

    j_negf = negf_current_natural(dyn, eta, bathL, bathR, TL, TR)

    assert j_negf > 0
    # agreement within 3 sigma and within 15%
    assert abs(j_md - j_negf) < max(3 * j_err, 0.15 * j_negf), (
        j_md, j_err, j_negf)


@pytest.mark.statistical
def test_conductance_within_2pct_of_negf():
    """North-star acceptance (BASELINE.md:20-23): quantum MD thermal
    conductance within 2% of the NEGF Landauer answer, with SEM < 1%.

    The raw per-bath heat current fluctuates at the zero-point scale,
    ~40x the DeltaT signal at 300 K — the naive estimator needs ~10^6
    trajectories for 1% SEM. Instead: an antithetic common-random-
    numbers estimator, J = (J(TL,TR; r) - J(TR,TL; r))/2 with identical
    Gaussian draws r for both temperature assignments. In this linear
    system the ZPM-dominated fluctuations are nearly
    realization-identical across the swap and cancel to the signal
    scale (measured: SEM 193% -> ~3% at the same ensemble size), and
    any TL<->TR-even estimator bias cancels exactly. The residual bias
    is set by the noise grid dw = 2 pi/(dt nmd) (measured -3% at
    nmd=2^14, -0.4% at 2^15, dt-independent), so the test runs at
    nmd=2^16.
    """
    nph, k_spring = 8, 0.04
    dt = 0.25 / 0.658
    nmd = 2 ** 16
    nens = 384
    T, delta = 300.0, 0.5
    TL, TR = T * (1 + delta / 2), T * (1 - delta / 2)
    eta = 1.0 / (50 / 0.658)
    dyn = np.asarray(chain_dynmat(nph, k_spring))
    bathL, bathR = [0], [nph - 1]
    mask = jnp.ones(nph)

    def baths_at(Ta, Tb):
        ebl = B.ebath(bathL, Ta, dt, nmd, wmax=1.0,
                      efric=np.eye(1) * eta, dtype=jnp.float64)
        ebr = B.ebath(bathR, Tb, dt, nmd, wmax=1.0,
                      efric=np.eye(1) * eta, dtype=jnp.float64)
        return ebl, ebr

    fwdL, fwdR = baths_at(TL, TR)
    revL, revR = baths_at(TR, TL)
    keys = jax.random.split(jax.random.PRNGKey(7), (nens, 2))

    def one(ks):
        def run(bl, br):
            bl = bl.gnoi(ks[0]).replace(nevecs=None, nstd=None)
            br = br.gnoi(ks[1]).replace(nevecs=None, nstd=None)
            sysb = make_system(dyn, [bl, br], dt, nmd)
            _, ys = run_segment(sysb,
                                initial_state(sysb, dtype=jnp.float64),
                                nmd)
            cur = ys["cur"][nmd // 4:]
            return (jnp.mean(cur[:, 0]) - jnp.mean(cur[:, 1])) / 2

        return (run(fwdL, fwdR) - run(revL, revR)) / 2

    j = np.asarray(jax.vmap(one)(keys))
    j_md = float(j.mean())
    sem = float(j.std() / np.sqrt(nens))

    j_negf = negf_current_natural(dyn, eta, bathL, bathR, TL, TR,
                                  nw=8000)
    dev = (j_md - j_negf) / j_negf
    print(f"\nconductance acceptance: J_md={j_md:.5e} (SEM "
          f"{sem / abs(j_md) * 100:.2f}%) vs J_negf={j_negf:.5e} -> "
          f"deviation {dev * 100:+.2f}%")
    assert sem / abs(j_md) < 0.01, f"SEM {sem/abs(j_md)*100:.2f}% >= 1%"
    assert abs(dev) < 0.02, f"deviation {dev*100:+.2f}% exceeds 2%"


@pytest.mark.slow
def test_classical_limit_conductance(key):
    """classical=True baths reproduce the classical Landauer integral
    (occupation kT/w)."""
    nph, k_spring = 6, 0.04
    dt, nmd = 0.4, 2 ** 14
    T, delta = 300.0, 0.5
    TL, TR = T * (1 + delta / 2), T * (1 - delta / 2)
    eta = 1.0 / 60.0
    dyn = np.asarray(chain_dynmat(nph, k_spring))
    bathL, bathR = [0], [nph - 1]

    nens = 8
    keys = jax.random.split(key, (nens, 2))

    def one(ks):
        ebl = B.ebath(bathL, TL, dt, nmd, wmax=1.0, efric=np.eye(1) * eta,
                      classical=True, dtype=jnp.float64).gnoi(ks[0])
        ebr = B.ebath(bathR, TR, dt, nmd, wmax=1.0, efric=np.eye(1) * eta,
                      classical=True, dtype=jnp.float64).gnoi(ks[1])
        sysb = make_system(dyn, [ebl, ebr], dt, nmd)
        _, ys = run_segment(sysb, initial_state(sysb, dtype=jnp.float64),
                            nmd)
        cur = ys["cur"][nmd // 4:]
        return jnp.mean(cur[:, 0]), jnp.mean(cur[:, 1])

    jl, jr = jax.vmap(one)(keys)
    j_md = float(jnp.mean((jl - jr) / 2))
    j_err = float(jnp.std((jl - jr) / 2) / np.sqrt(nens))

    # classical Landauer: occupation n = kT/w -> J = (1/2pi) int T(w)
    # kB (TL-TR) dw
    dyn_np = np.asarray(dyn)
    nd = len(dyn_np)
    ws = np.linspace(0, 1.0, 2001)[1:]
    tm = []
    for w in ws:
        se = np.zeros((nd, nd), complex)
        se[0, 0] = se[-1, -1] = -1j * w * eta
        g = np.linalg.inv((w + 1e-9j) ** 2 * np.eye(nd) - dyn_np - se)
        gm = np.zeros((nd, nd)); gm[0, 0] = 2 * w * eta
        gp = np.zeros((nd, nd)); gp[-1, -1] = 2 * w * eta
        tm.append(np.real(np.trace(g @ gm @ g.conj().T @ gp)))
    j_cl = np.trapezoid(np.array(tm), ws) * U.KB * (TL - TR) / (2 * np.pi)

    assert abs(j_md - j_cl) < max(3 * j_err, 0.15 * j_cl), (
        j_md, j_err, j_cl)


@pytest.mark.slow
def test_warm_start_conductance_matches_negf(key):
    """The periodic-attractor warm estimator (the bench crosscheck's
    production estimator) reproduces the Landauer current WITHOUT an
    equilibration discard and at a short run length.

    A cold antithetic start at this tier carries the DeltaT-odd
    state-noise-correlation transient (flagship: +7.9% at nmd=2^13);
    on the attractor the expected current is time-independent, so the
    full period is averaged unbiased. End-to-end physics pin of
    md.gle_step_jacobian / periodic_fixed_point / state_(un)ravel —
    the deterministic TestPeriodicWarmStart covers only the fixed-point
    property, not the measured observable."""
    from sclmd_tpu.md import (gle_step_jacobian, period_power,
                              periodic_fixed_point, state_ravel,
                              state_unravel)

    nph, k_spring = 8, 0.04
    dt, nmd = 0.25 / 0.658, 2 ** 13
    T, delta = 300.0, 0.5
    TL, TR = T * (1 + delta / 2), T * (1 - delta / 2)
    eta = 1.0 / (50 / 0.658)
    dyn = np.asarray(chain_dynmat(nph, k_spring))
    bathL, bathR = [0], [nph - 1]
    nens = 48

    def baths_at(Ta, Tb):
        return (B.ebath(bathL, Ta, dt, nmd, wmax=1.0,
                        efric=np.eye(1) * eta, dtype=jnp.float64),
                B.ebath(bathR, Tb, dt, nmd, wmax=1.0,
                        efric=np.eye(1) * eta, dtype=jnp.float64))

    sys_template = make_system(dyn, list(baths_at(TL, TR)), dt, nmd)
    A = gle_step_jacobian(sys_template)       # T-independent
    AP = period_power(A, nmd)
    keys = jax.random.split(key, (nens, 2))

    def direction(Ta, Tb):
        bl0, br0 = baths_at(Ta, Tb)

        def one(ks):
            bl = bl0.gnoi(ks[0]).replace(nevecs=None, nstd=None)
            br = br0.gnoi(ks[1]).replace(nevecs=None, nstd=None)
            sysb = make_system(dyn, [bl, br], dt, nmd)
            fin1, _ = run_segment(sysb,
                                  initial_state(sysb, dtype=jnp.float64),
                                  nmd)
            return sysb, fin1

        js = []
        for ks in keys:
            sysb, fin1 = one(ks)
            x0 = periodic_fixed_point(A, state_ravel(fin1), nmd,
                                      power=AP)
            stw = state_unravel(x0, sysb, dtype=jnp.float64)
            _, ys = run_segment(sysb, stw, nmd)
            cur = ys["cur"]                   # full period, no discard
            js.append((float(jnp.mean(cur[:, 0]))
                       - float(jnp.mean(cur[:, 1]))) / 2)
        return np.asarray(js)

    j = (direction(TL, TR) - direction(TR, TL)) / 2
    j_md = float(j.mean())
    sem = float(j.std() / np.sqrt(nens))
    # the sharp reference is the EXACT attractor expectation at the
    # same tier (ops.exact_gle): the 8-DOF chain's comb-grid bias at
    # nmd=2^13 is large and oscillatory (-19.6% here, +3.4% at 2^14,
    # -0.8% at 2^15 vs continuum Landauer), and the warm estimator
    # must land on the attractor value to pure statistics
    from sclmd_tpu.ops.exact_gle import attractor_expected_currents

    sys_th = make_system(
        dyn, [b.prepare_noise() for b in baths_at(TL, TR)], dt, nmd)
    th = attractor_expected_currents(sys_th)
    j_th = (th[0] - th[1]) / 2
    j_negf = negf_current_natural(dyn, eta, bathL, bathR, TL, TR,
                                  nw=4000)
    print(f"\nwarm-start conductance: J_md={j_md:.5e} (SEM "
          f"{sem / j_th * 100:.2f}%) vs exact-discrete {j_th:.5e} "
          f"({(j_md - j_th) / j_th * 100:+.2f}%); continuum Landauer "
          f"{j_negf:.5e} (comb bias "
          f"{(j_th - j_negf) / j_negf * 100:+.2f}%)")
    assert abs(j_md - j_th) < max(3 * sem, 0.01 * abs(j_th)), (
        j_md, sem, j_th)


@pytest.mark.slow
def test_phonon_bath_conductance_matches_negf(key):
    """Debye PHONON baths (wideband Gamma = w_D pi/6) reproduce the
    Landauer current — end-to-end validation of the phbath path."""
    nph, k_spring = 8, 0.04
    dt, nmd = 0.25 / 0.658, 2 ** 14
    T, delta = 300.0, 0.5
    TL, TR = T * (1 + delta / 2), T * (1 - delta / 2)
    debye = 0.05
    gam = debye * np.pi / 6.0

    dyn = np.asarray(chain_dynmat(nph, k_spring))
    bathL, bathR = [0], [nph - 1]
    nens = 8
    keys = jax.random.split(key, (nens, 2))

    def one(ks):
        pbl = B.phbath(TL, bathL, debye, 200, dt, nmd,
                       dtype=jnp.float64).gnoi(ks[0])
        pbr = B.phbath(TR, bathR, debye, 200, dt, nmd,
                       dtype=jnp.float64).gnoi(ks[1])
        sysb = make_system(dyn, [pbl, pbr], dt, nmd)
        _, ys = run_segment(sysb, initial_state(sysb, dtype=jnp.float64),
                            nmd)
        cur = ys["cur"][nmd // 4:]
        return jnp.mean(cur[:, 0]), jnp.mean(cur[:, 1])

    jl, jr = jax.vmap(one)(keys)
    j_md = float(jnp.mean((jl - jr) / 2))
    j_err = float(jnp.std((jl - jr) / 2) / np.sqrt(nens))

    # NEGF with the same wideband coupling and the phonon-bath cutoff
    # wmax = 2*debye entering through the noise spectrum only; the
    # friction is constant, so the Caroli T(w) uses gamma = w_D pi/6
    j_negf = negf_current_natural(dyn, gam, bathL, bathR, TL, TR,
                                  wmax=2 * debye)
    assert j_negf > 0
    assert abs(j_md - j_negf) < max(3 * j_err, 0.2 * j_negf), (
        j_md, j_err, j_negf)


def _usek_chain_setup():
    """Shared UseK tier: 8-atom chain, semi-infinite-chain lead blocks.

    Bookkeeping pinned here: the GLE kernel reproduces
    Sigma(w) - Sigma(0), so the MD dynamical matrix is the BARE device
    (end onsite k); the NEGF side uses the bulk-onsite device block
    (2k at the ends) with the full Sigma(w)."""
    k = 0.04
    nph = 8
    dt = 0.25 / 0.658
    T, delta = 300.0, 0.5
    nmd, ml = 2 ** 11, 128
    D = np.array(chain_dynmat(nph, k))
    K00 = np.array([[2 * k]])
    K01 = np.array([[-k]])
    V01 = np.array([[-k]])
    return k, nph, dt, T, delta, nmd, ml, D, K00, K01, V01


def _usek_landauer(k, nph, D, K00, K01, V01, TL, TR, classical):
    """Continuum NEGF reference: dense Caroli with the decimated
    Sigma on both ends (the deterministic side of the crosscheck)."""
    from sclmd_tpu.selfenergy import lead_selfenergy_from_blocks_np

    D_negf = D.copy()
    D_negf[0, 0] += k
    D_negf[-1, -1] += k
    ws = np.linspace(1e-4, 2.2 * np.sqrt(k), 2000)
    sig_w = lead_selfenergy_from_blocks_np(K00, K01, V01, ws, eta=1e-6)
    tm = []
    for i, w in enumerate(ws):
        se = np.zeros((nph, nph), complex)
        se[0, 0] = sig_w[i, 0, 0]
        se[-1, -1] = sig_w[i, 0, 0]
        g = np.linalg.inv((w + 1e-9j) ** 2 * np.eye(nph) - D_negf - se)
        gam = -2 * np.imag(sig_w[i, 0, 0])
        gl = np.zeros((nph, nph)); gl[0, 0] = gam
        gr = np.zeros((nph, nph)); gr[-1, -1] = gam
        tm.append(np.real(np.trace(g @ gl @ g.conj().T @ gr)))
    tm = np.array(tm)
    assert max(tm) > 0.99          # perfect chain: ballistic in band
    if classical:
        return float(np.trapezoid(tm, ws) * U.KB * (TL - TR)
                     / (2 * np.pi))
    return float(landauer_current_natural(ws, tm, TL, TR))


def _usek_rebased(classical, seed, nens=4096):
    """Re-based UseK crosscheck (VERDICT r3 item 2): MD is compared to
    the EXACT discrete attractor expectation
    (ops.exact_gle.attractor_expected_currents) — same comb grid, same
    trapezoidal convolution taps, same kernel truncation, so the
    comparison carries ZERO grid/dt bias and the 2% bar holds without
    Richardson tiers or statistical luck (measured: -1.0%/+0.7% across
    seeds at SEM 0.56%). Theory-vs-continuum-Landauer is kept as the
    separate, deterministic discretization statement.

    Estimator: the packaged warm-start antithetic composition
    (parallel.ensemble.antithetic_run) — the periodic-attractor start
    is exactly what the theory computes the expectation OF, so
    MD-vs-theory is pure statistics at ANY tier.
    """
    import tempfile

    from sclmd_tpu.md import md as MDRunner
    from sclmd_tpu.ops.exact_gle import (attractor_expected_currents,
                                         prepare_attractor)
    from sclmd_tpu.parallel.ensemble import _noisy_system, antithetic_run

    k, nph, dt, T, delta, nmd, ml, D, K00, K01, V01 = _usek_chain_setup()
    TL, TR = T * (1 + delta / 2), T * (1 - delta / 2)

    def build(Ta, Tb):
        r = MDRunner(dt, nmd, T, dyn=D, dtype=jnp.float64, seed=seed,
                     outdir=tempfile.mkdtemp(prefix="usek_"))
        for cid, tt in (([0], Ta), ([nph - 1], Tb)):
            r.AddBath(B.phbath(tt, cid, np.sqrt(k), 400, dt, nmd, ml=ml,
                               K00=K00, K01=K01, V01=V01, mcof=2.2,
                               classical=classical, dtype=jnp.float64))
        return r

    # exact theory, both directions, ONE temperature-independent prep
    sys_f = _noisy_system(build(TL, TR))
    prep = prepare_attractor(sys_f)
    th_f = attractor_expected_currents(sys_f, method="schur", prep=prep)
    th_r = attractor_expected_currents(_noisy_system(build(TR, TL)),
                                       method="schur", prep=prep)
    j_th = ((th_f[0] - th_f[1]) / 2 - (th_r[0] - th_r[1]) / 2) / 2

    j = antithetic_run(build, TL, TR, nens, warm_start=True, seed=seed,
                       block=64)
    j_md = float(j.mean())
    sem = float(j.std() / np.sqrt(nens))
    assert j_th > 0
    # statistics must leave margin under the bar (2% at 3.5 sigma)
    assert sem < 0.007 * j_th, (sem, j_th)
    assert abs(j_md - j_th) < 0.02 * j_th, (
        j_md, j_th, (j_md - j_th) / j_th, sem)

    # deterministic leg: exact-discrete theory vs continuum Landauer —
    # the comb/dt discretization bias at this tier, isolated from any
    # statistics (measured ~-1.6% quantum / ~-2.5% classical)
    j_negf = _usek_landauer(k, nph, D, K00, K01, V01, TL, TR, classical)
    assert abs(j_th - j_negf) < 0.04 * j_negf, (j_th, j_negf)


@pytest.mark.statistical
def test_usek_lead_blocks_conductance_matches_negf():
    """End-to-end validation of the K00/K01/V01 bath mode (the mode the
    reference declares but aborts on, baths.py:316-320), classical
    statistics — re-based on the exact discrete attractor theory and
    held to 2% (VERDICT r3 item 2; r2 held 3% vs continuum Landauer
    only via Richardson-in-dt tiers, r1 15%)."""
    _usek_rebased(classical=True, seed=5)


@pytest.mark.slow
def test_equilibrium_power_spectrum_matches_negf(key):
    """Fluctuation-dissipation: the MD velocity power spectrum of an
    equilibrium junction matches the NEGF harmonic power spectrum
    -2 w^2 n_B Tr Im G^r (negf.py:232) — the reference computes both
    (md.GetPower vs bpt.getps) but never compares them."""
    from sclmd_tpu.ops.functions import bose, powerspecp

    nph, k_spring = 6, 0.04
    dt, nmd = 0.25 / 0.658, 2 ** 13
    T = 300.0
    eta = 1.0 / (50 / 0.658)
    dyn = np.asarray(chain_dynmat(nph, k_spring))
    bathL, bathR = [0], [nph - 1]

    nens = 12
    keys = jax.random.split(key, (nens, 2))

    def one(ks):
        ebl = B.ebath(bathL, T, dt, nmd, wmax=1.0, efric=np.eye(1) * eta,
                      dtype=jnp.float64).gnoi(ks[0])
        ebr = B.ebath(bathR, T, dt, nmd, wmax=1.0, efric=np.eye(1) * eta,
                      dtype=jnp.float64).gnoi(ks[1])
        sysb = make_system(dyn, [ebl, ebr], dt, nmd, savep=True)
        _, ys = run_segment(sysb, initial_state(sysb, dtype=jnp.float64),
                            nmd)
        return powerspecp(ys["ps"], dt, nmd)[:, 1]

    spec = np.asarray(jax.vmap(one)(keys)).mean(axis=0)
    dw = 2 * np.pi / dt / nmd
    ws = dw * np.arange(nmd)

    # NEGF: P(w) = -2 w^2 (n_B + 1/2) Tr Im G^r(w) — the MD runs with
    # zero-point motion, so the analytic spectrum must carry the 1/2
    # (the reference's getps branch, negf.py:232, omits it and would
    # be compared against zpmotion=False runs)
    def negf_ps(w):
        se = np.zeros((nph, nph), complex)
        se[0, 0] = se[-1, -1] = -1j * w * eta
        g = np.linalg.inv((w + 1e-9j) ** 2 * np.eye(nph) - dyn - se)
        return -2 * w ** 2 * (float(bose(w, T)) + 0.5) * \
            np.trace(np.imag(g))

    # compare integrated spectral weight over the phonon band
    band = (ws > 0.02) & (ws < 0.45)
    md_int = np.trapezoid(spec[band], ws[band])
    negf_int = np.trapezoid([negf_ps(w) for w in ws[band]], ws[band])
    assert negf_int > 0
    assert abs(md_int - negf_int) / negf_int < 0.2, (md_int, negf_int)


@pytest.mark.statistical
@pytest.mark.slow
def test_usek_quantum_conductance_antithetic():
    """Quantum-statistics version of the UseK crosscheck — re-based on
    the exact discrete attractor theory and held to 2% (VERDICT r3
    item 2; r2 held 4% vs continuum Landauer at a dt/2 tier). The
    quantum PSD (zero-point + Bose occupation) feeds both the MD noise
    synthesis and the theory's per-line covariance, so the comparison
    pins the quantum noise conventions end-to-end.

    slow tier (r5): 125 s — the heaviest fast-tier test, and its two
    legs are each pinned cheaper elsewhere (UseK bath mode: the
    classical twin below; quantum noise conventions:
    test_conductance_within_2pct_of_negf)."""
    _usek_rebased(classical=False, seed=5)
