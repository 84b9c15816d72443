"""Ensemble data-parallelism and multi-chip sharding.

The reference runs independent trajectories sequentially
(/root/reference/sclmd/md.py:506 — the nstart..nstop loop). Here the
ensemble axis is a ``vmap`` batch: every trajectory carries its own
colored-noise series (independent PRNG keys), and the whole batch is one
XLA program. On a device mesh, trajectories shard over the ``dp`` axis
and the per-bath matrices (friction / memory-kernel) can shard over a
``tp`` axis — XLA inserts the collectives.

This is the TPU replacement for "no parallelism in the reference"
(SURVEY.md section 2): DP = vmapped trajectories; TP = sharded bath
matmuls; the memory-kernel (sequence-like) axis stays on-chip as the
scan carry.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sclmd_tpu.md import GLESystem, MDState, initial_state, run_segment, \
    run_segment_blocked, thermal_init


def make_mesh(axis_sizes: dict[str, int],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh from {'dp': n, 'tp': m}-style axis sizes."""
    devices = devices if devices is not None else jax.devices()
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev, names)


def ensemble_noise(system: GLESystem, key: jax.Array, n: int,
                   lo: int = 0, hi: Optional[int] = None) -> GLESystem:
    """Attach independent noise series per bath (leading batch axis).

    ``lo``/``hi`` select a trajectory window of an ``n``-trajectory
    ensemble: the key schedule depends only on (key, bath, trajectory
    index), so a chunked ensemble synthesizing successive lo:hi windows
    gets bitwise the SAME noise as the full batch — memory-wall chunking
    (md.RunEnsemble) changes peak HBM, never the physics.

    Baths carrying PSD factors sample through the cached batched jit
    (identical statistics to per-key ``gnoi``, no per-call re-trace);
    factorless baths fall back to the vmapped all-jnp synthesis."""
    from sclmd_tpu.ops.noise import sample_noise_dev_batch

    hi = n if hi is None else hi
    new_baths = []
    for i, b in enumerate(system.baths):
        bkeys = jax.random.fold_in(key, i)
        keys = jax.random.split(bkeys, n)[lo:hi]
        if getattr(b, "nstd", None) is not None:
            noise = sample_noise_dev_batch(b, keys)
        else:
            noise = jax.vmap(lambda k: b.gnoi(k).noise)(keys)
        # drop the (complex) PSD factors from the hot-loop pytree
        new_baths.append(b.replace(noise=noise, nevecs=None, nstd=None))
    return system.replace(baths=tuple(new_baths))


def ensemble_states(system: GLESystem, n: int, key=None, hw=None,
                    evecs=None, T=None, dtype=None,
                    lo: int = 0, hi: Optional[int] = None) -> MDState:
    """Batched initial states: zeros, or Bose-weighted thermal draws.

    ``lo``/``hi`` window an ``n``-trajectory ensemble (see
    ensemble_noise) — chunked draws match the full batch bitwise."""
    hi = n if hi is None else hi
    if key is None:
        st = initial_state(system, dtype=dtype)
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (hi - lo,) + x.shape), st)
    keys = jax.random.split(key, n)[lo:hi]
    return jax.vmap(lambda k: thermal_init(k, system, hw, evecs, T))(keys)


def estimate_traj_bytes(system: GLESystem, nsteps: int,
                        block: Optional[int] = None) -> int:
    """Rough per-trajectory peak-HBM estimate for one ensemble member.

    Counts the resident batched arrays (noise series, history rings,
    per-step outputs) plus the transient synthesis/stream copies, with a
    2x allocator-slack factor. Used by md.RunEnsemble's auto-chunking —
    the production answer to the reference workload's nmd=2e5 noise
    arrays (SURVEY.md "hard parts": noise must stream from HBM or be
    regenerated in chunks)."""
    item = int(np.dtype(system.mask.dtype).itemsize)
    nb = len(system.baths)
    total = 0
    for b in system.baths:
        nc = int(b.nc)
        # resident noise (nmd, nc) + one rolled stream copy (nsteps, nc)
        # + synthesis transient (complex half-spectrum ~= nmd * nc reals
        # x2 for the iFFT scratch)
        total += (system.nmd + nsteps + 2 * system.nmd) * nc * item
        if getattr(b, "ml", 1) > 1:
            # blocked-path history + FFT cross-correlation scratch
            total += (b.ml + (block or 64) + system.nmd // 8) * nc * item
    # state + plain-path history ring
    total += (system.ml + 4) * system.nph * item
    # per-step outputs (etot + per-bath currents)
    total += nsteps * (nb + 1) * item
    return 2 * total


def auto_chunk(system: GLESystem, ntraj: int, nsteps: int,
               block: Optional[int] = None,
               budget_bytes: Optional[int] = None) -> int:
    """Largest trajectory-chunk size that fits the HBM budget.

    Budget: ``SCLMD_HBM_BUDGET_GB`` env var, default 4 GiB (conservative
    for the shared-tunnel chip; a dedicated v5e has ~16 GiB). Chunks are
    additionally capped at 512 — measured throughput on both the primary
    and flagship workloads saturates by ~256-512 and the 1024-trajectory
    batch DEGRADES (docs/PERF.md), so bigger chunks only add risk."""
    import os
    if budget_bytes is None:
        gb = float(os.environ.get("SCLMD_HBM_BUDGET_GB", "4"))
        budget_bytes = int(gb * 2 ** 30)
    per = max(estimate_traj_bytes(system, nsteps, block), 1)
    chunk = max(1, min(budget_bytes // per, 512))
    if chunk >= ntraj:
        return int(ntraj)          # whole ensemble fits: one chunk
    # otherwise align down to a power of two (divisor-friendly, and
    # keeps every chunk the same shape -> one compiled program)
    return 1 << (int(chunk).bit_length() - 1)


def _system_axes(system: GLESystem):
    """vmap in_axes spec: batch only the per-bath noise leaves."""
    axes = jax.tree_util.tree_map(lambda _: None, system)
    return axes.replace(baths=tuple(
        b.replace(noise=0) for b in axes.baths))


@partial(jax.jit, static_argnames=("nsteps", "t0", "block"))
def _ensemble_segment(system: GLESystem, states: MDState, nsteps: int,
                      t0: int, block: Optional[int]):
    if block is None:
        fn = partial(run_segment, nsteps=nsteps, t0=t0)
    else:
        fn = partial(run_segment_blocked, nsteps=nsteps, t0=t0,
                     block=block)
    return jax.vmap(fn, in_axes=(_system_axes(system), 0))(system, states)


def ensemble_run(system: GLESystem, states: MDState, nsteps: int,
                 t0: int = 0, block: Optional[int] = None):
    """Run nsteps of GLE MD for the whole batch (one compiled program).

    ``t0``: static segment offset (mod nmd) — must equal the trajectories'
    current step count, as in md.run_segment.
    ``block``: use the blocked-convolution integrator
    (md.run_segment_blocked) with this block size — the fast path for
    long memory kernels; the kernel FFT is shared across the batch.

    The segment is a module-level jit (static nsteps/t0/block), so
    repeated calls with the same system STRUCTURE hit the trace cache —
    re-tracing the vmapped integrator on every call cost ~9 s/call on
    the tunnel for many-body junctions (the flagship workload) before
    this was cached.
    """
    return _ensemble_segment(system, states, nsteps, t0, block)


def shard_ensemble(mesh: Mesh, system: GLESystem, states: MDState,
                   dp: str = "dp", tp: Optional[str] = None):
    """Place the batch on a mesh: trajectories over ``dp``; optionally
    shard each bath's friction/kernel matrices row-wise over ``tp``.
    """
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    states = jax.tree_util.tree_map(lambda x: put(x, P(dp)), states)
    new_baths = []
    for b in system.baths:
        b = b.replace(noise=put(b.noise, P(dp)))
        if tp is not None:
            if hasattr(b, "efric"):
                b = b.replace(efric=put(b.efric, P(tp, None)))
            if getattr(b, "kernel", None) is not None and \
                    not isinstance(getattr(type(b), "kernel", None),
                                   property):
                # row-shard the kernel's output-DOF axis (PhBath field;
                # EBath exposes kernel only as a derived property); the
                # MXU layout (kernel_im property) inherits the sharding
                b = b.replace(kernel=put(b.kernel, P(None, tp, None)))
        new_baths.append(b)
    system = system.replace(baths=tuple(new_baths))
    if system.dyn is not None and tp is not None:
        system = system.replace(dyn=put(system.dyn, P(tp, None)))
    return system, states


def sharded_ensemble_run(mesh: Mesh, system: GLESystem, states: MDState,
                         nsteps: int, t0: int = 0, dp: str = "dp",
                         tp: Optional[str] = None):
    """Shard, then run: the jitted batched scan partitions over the mesh.
    ``t0`` is the trajectories' current step offset (mod nmd) so the
    noise stream stays aligned across successive segments."""
    system, states = shard_ensemble(mesh, system, states, dp=dp, tp=tp)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        return ensemble_run(system, states, nsteps, t0=t0)
