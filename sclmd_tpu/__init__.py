"""sclmd_tpu: TPU-native semiclassical GLE molecular dynamics.

A ground-up JAX/XLA re-design of the capabilities of the
reference package sclmd (quantum-bath generalized-Langevin-equation MD
for nano-junctions + NEGF phonon transport): see SURVEY.md for the
component map. Public surface:

    sclmd_tpu.md          GLE integrator (functional core + `md` runner)
    sclmd_tpu.baths       ebath / phbath quantum baths
    sclmd_tpu.negf        bpt ballistic phonon transport
    sclmd_tpu.selfenergy  sig decimation lead self-energies
    sclmd_tpu.models      force drivers (harmonic, pair, Tersoff, C/H
                          hydrocarbon, SW, EAM, NNP, native C++,
                          fsiesta) + FIRE/L-BFGS relaxation
    sclmd_tpu.parallel    vmapped/sharded trajectory ensembles
    sclmd_tpu.utils       analysis tools, IO, config, profiling
    sclmd_tpu.postprocess Lambda + HSSigma current-induced pipelines
    sclmd_tpu.units       unit system + element data
"""

__version__ = "0.1.0"

from sclmd_tpu import units  # noqa: F401
