#!/usr/bin/env python
"""Attribute the generic (unfused) PDS chain's per-iteration time to device
ops (VERDICT r3 task 4: generic_raw 240 -> >= 400 iters/s needs to know where
the 4.15 ms/iter go).

Captures an xprof trace around one ``run_fixed`` chunk of the 4096^2 TV
deconvolution expression with ``fuse=False`` and prints the top device ops by
total duration (trace.json.gz parse — XLA-op granularity, the method from
docs/BENCH.md "The r3 trace").

Run ON THE TPU: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_generic.py
"""
import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def top_ops(logdir, n=30):
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace.json.gz found under", logdir)
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-lane complete events: pid/tid lanes named like TPU/device; keep
    # all X events with a duration and bucket by name
    durs = defaultdict(float)
    counts = defaultdict(int)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        durs[e["name"]] += e.get("dur", 0)
        counts[e["name"]] += 1
    total = sum(durs.values())
    print(f"\n== device ops (total {total/1e3:.1f} ms across lanes: "
          f"{sorted(set(pid_names.values()))}) ==")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:n]:
        print(f"{d/1e3:9.2f} ms  x{counts[name]:5d}  {name[:110]}")


def main():
    import jax
    import jax.numpy as jnp

    from pycsou_tpu.func import NonNegativeOrthant, SquaredL2Loss
    from pycsou_tpu.func.penalty import L21Norm
    from pycsou_tpu.ops.conv import Convolve2D
    from pycsou_tpu.ops.diff import Gradient
    from pycsou_tpu.opt import PDS
    from pycsou_tpu.utils.profiling import trace

    SHAPE = (4096, 4096)
    k = 15
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax**2) / (2 * 2.0**2))
    h = np.outer(g, g).astype(np.float32)
    h /= h.sum()
    rng = np.random.default_rng(0)
    y = jnp.asarray(np.abs(rng.standard_normal(SHAPE)).astype(np.float32))

    A = Convolve2D(SHAPE, h)
    F = SquaredL2Loss(SHAPE, data=y) * A
    solver = PDS(
        SHAPE, F=F, G=NonNegativeOrthant(SHAPE),
        H=0.05 * L21Norm((2,) + SHAPE, axis=0), K=Gradient(SHAPE),
        max_iter=2000, fuse=False,
    )
    print("gram route:", type(getattr(F, "_gram", None)).__name__, file=sys.stderr)

    N = int(os.environ.get("PROF_ITERS", "50"))
    state = solver.run_fixed(N)
    jax.block_until_ready(state["x"])  # compile + warm
    t0 = time.perf_counter()
    state = solver.run_fixed(4 * N, state=state)
    jax.block_until_ready(state["x"])
    t = time.perf_counter() - t0
    print(f"warm chunk: {t/(4*N)*1e3:.2f} ms/iter (incl. ~27 ms dispatch const)",
          file=sys.stderr)

    logdir = os.environ.get("PROF_DIR") or tempfile.mkdtemp(prefix="generic_prof_")
    with trace(logdir):
        state = solver.run_fixed(N, state=state)
        jax.block_until_ready(state["x"])
    print("trace dir:", logdir, file=sys.stderr)
    top_ops(logdir)
    print(f"\nper-iteration wall (warm): {t/(4*N)*1e3:.2f} ms over {4*N} iters")


if __name__ == "__main__":
    main()
