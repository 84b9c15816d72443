"""Pallas TPU kernels for the GLE hot ops.

The per-step memory-kernel friction convolution is the framework's
speed-of-light target (BASELINE north star: 1000-tap kernel). Its core
contraction is

    tails = K2 @ B,   K2: (nc, (ml-2) nc)  [the time-kernel in MXU
                      layout],  B: ((ml-2) nc, p)  [shifted history
                      columns: p = 2 per trajectory]

which is HBM-bandwidth-bound by K2 (e.g. 32 MB at nc=90, ml=1000).
``conv_matmul`` implements it as a K-reduction-on-the-grid Pallas
matmul with float32 MXU accumulation and VMEM-resident blocks; the
kernel operand streams through VMEM exactly once. XLA generates an
equivalent schedule for the plain dot — this kernel exists to (a) pin
the schedule explicitly, (b) serve as the template for fused variants
(noise add + scatter), and (c) be the measured reference point in
tests/benchmarks.

All shapes are padded to the (8, 128) float32 tile grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _conv_matmul_kernel(a_ref, b_ref, o_ref):
    """Grid step i accumulates A[:, i-block] @ B[i-block, :] into o."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def conv_matmul(a, b, block_k: int = 1024, interpret: bool = False):
    """a (m, k) @ b (k, p) with K-reduction over the Pallas grid.

    m and p are padded to the float32 tile (8, 128); k to block_k.
    Returns the unpadded (m, p) product in float32.
    """
    m, k = a.shape
    k2, p = b.shape
    assert k == k2
    mp = _round_up(m, 8)
    pp = _round_up(p, 128)
    kp = _round_up(k, block_k)
    a_pad = jnp.zeros((mp, kp), jnp.float32).at[:m, :k].set(
        a.astype(jnp.float32))
    b_pad = jnp.zeros((kp, pp), jnp.float32).at[:k, :p].set(
        b.astype(jnp.float32))

    grid = (kp // block_k,)
    out = pl.pallas_call(
        _conv_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mp, block_k), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, pp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, pp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, pp), jnp.float32),
        interpret=interpret,
    )(a_pad, b_pad)
    return out[:m, :p]


def _fused_bath_force_kernel(k0_ref, noise_ref, v_ref, tail_ref, o_ref,
                             *, dt):
    """Fused Markov term + noise + tail: f = noise - dt*(K0 v + tail)."""
    conv = jnp.dot(k0_ref[:], v_ref[:],
                   preferred_element_type=jnp.float32)
    o_ref[:] = noise_ref[:] - dt * (conv + tail_ref[:])


@functools.partial(jax.jit, static_argnames=("dt", "interpret"))
def fused_bath_force(k0, noise, v, tail, dt: float,
                     interpret: bool = False):
    """Single-launch bath force for one evaluation: (nc,) vectors.

    f = noise - dt * (K0 @ v + tail). Pads nc to the tile grid.
    """
    nc = k0.shape[0]
    ncp = _round_up(nc, 8)
    lane = 128
    k0_pad = jnp.zeros((ncp, ncp if ncp % lane == 0 else
                        _round_up(ncp, lane)), jnp.float32)
    kcol = k0_pad.shape[1]
    k0_pad = k0_pad.at[:nc, :nc].set(k0.astype(jnp.float32))

    def vecpad(x):
        return jnp.zeros((kcol, lane), jnp.float32).at[:nc, 0].set(
            x.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_fused_bath_force_kernel, dt=dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncp, lane), jnp.float32),
        interpret=interpret,
    )(k0_pad[:ncp], vecpad(noise)[:ncp], vecpad(v),
      vecpad(tail)[:ncp])
    return out[:nc, 0]


def memory_conv_tails(kernel_im2, old_c, ml: int, nc: int,
                      interpret: bool = False):
    """Pallas version of PhBath.step_plan's shared-tail contraction.

    kernel_im2: (nc, (ml-2) nc) — kernel slabs 2..ml-1 in MXU layout.
    old_c: (ml, nc) pre-push history ring. Returns (nc, 2) float32.
    """
    B = jnp.stack([old_c[1:ml - 1], old_c[0:ml - 2]], axis=2)
    return conv_matmul(kernel_im2, B.reshape((ml - 2) * nc, 2),
                       interpret=interpret)
