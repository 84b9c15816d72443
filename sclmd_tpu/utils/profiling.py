"""Tracing and profiling utilities.

The reference's only performance tooling is tqdm progress bars and two
committed pycallgraph dumps (flow/sclmd.dot, flow/negf.dot — SURVEY.md
section 5). Here: a structured wall-clock tracer whose report mirrors
the call-count/total-time content of those profiles, plus hooks into
the JAX device profiler and compiled-cost introspection.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional


class Tracer:
    """Nested wall-clock section tracer.

    with tracer.section("noise"):
        ...
    print(tracer.report())
    """

    def __init__(self):
        self.stats = defaultdict(lambda: [0, 0.0])   # name -> [calls, secs]
        self._stack = []

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        """Time a section; ``sync`` (e.g. jax.block_until_ready on a
        result getter) runs before the clock stops."""
        path = "/".join([*self._stack, name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                sync()
            dt = time.perf_counter() - t0
            self._stack.pop()
            st = self.stats[path]
            st[0] += 1
            st[1] += dt

    def wrap(self, name: str, fn, sync_result: bool = True):
        """Wrap a callable so every invocation is traced (device results
        are blocked on so the time is real, not dispatch time)."""
        import jax

        def wrapped(*a, **kw):
            with self.section(name):
                out = fn(*a, **kw)
                if sync_result:
                    jax.block_until_ready(out)
                return out
        return wrapped

    def report(self, sort_by_time: bool = True) -> str:
        rows = sorted(self.stats.items(),
                      key=(lambda kv: -kv[1][1]) if sort_by_time else None)
        lines = ["%-40s %10s %12s %12s" % ("section", "calls",
                                           "total[s]", "per-call[ms]")]
        for name, (calls, secs) in rows:
            lines.append("%-40s %10d %12.4f %12.3f"
                         % (name, calls, secs, 1e3 * secs / max(calls, 1)))
        return "\n".join(lines)

    def to_json(self, path: Optional[str] = None) -> str:
        d = {k: {"calls": v[0], "seconds": v[1]}
             for k, v in self.stats.items()}
        s = json.dumps(d, indent=2)
        if path:
            with open(path, "w") as fh:
                fh.write(s)
        return s


@contextlib.contextmanager
def device_trace(logdir: str):
    """JAX device profiler context (TensorBoard format): kernel-level
    timeline of everything launched inside."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compiled_cost(fn, *args, **kwargs):
    """XLA's own cost analysis of a jitted function for the given args:
    {'flops': ..., 'bytes accessed': ...} when the backend provides it."""
    import jax
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        return compiled.cost_analysis()
    except Exception:
        return None


def flops_estimate_gle_step(nph: int, nbaths: int, nc: int, ml: int):
    """Analytic per-step cost model of the GLE step (for roofline
    comparisons): potential 2 x nph^2 MACs (harmonic), memory kernel
    one (nc, (ml-2) nc) matmul with 2 columns + 6 small matvecs."""
    pot = 2 * 2 * nph * nph
    kern = nbaths * (2 * (ml - 2) * nc * nc * 2 + 6 * 2 * nc * nc)
    return {"flops": pot + kern,
            "kernel_bytes": nbaths * ml * nc * nc * 4}
