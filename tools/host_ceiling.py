"""Host-ceiling calibration: pure-Python multiprocessing extraction (no
Spark, no JVM) at several process counts. Establishes what 4:1 scaling THIS
machine can physically deliver for the extraction workload — the upper bound
any engine measurement should be judged against (shared/virtualized boxes
with SMT rarely deliver 1.0).

Usage: python tools/host_ceiling.py  → one JSON line + markdown rows.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must be a multiple of the 10k batch size below — throughput is credited
# as ROWS_PER_PROC per process, so partial batches would inflate the figure
ROWS_PER_PROC = 280_000


def work(_):
    """Per-process unit: the SAME vectorized batch extraction the engine
    runs inside mapInPandas (plans/extract_vec.extract_batch), over pandas
    batches of 10k rows — so the ceiling is measured on the real workload,
    not a proxy."""
    import numpy as np
    import pandas as pd

    from __spark_entry__ import _GAZ, _ORGS, _PEOPLE
    from quad_processor_util_spark.oracle import Gazetteer
    from quad_processor_util_spark.plans.extract_vec import extract_batch

    gaz = Gazetteer(_GAZ)
    texts = [
        f"{p} works at {o} number {i}."
        for i, (p, o) in enumerate((pp, oo) for pp in _PEOPLE for oo in _ORGS)
    ]
    batch = 10_000
    pdf = pd.DataFrame({
        "conv_id": [f"c{i % 97}" for i in range(batch)],
        "turn_idx": np.arange(batch, dtype="int32"),
        "role": ["user"] * batch,
        "text": (texts * (batch // len(texts) + 1))[:batch],
        "tool": [None] * batch,
    })
    c = 0
    for _i in range(ROWS_PER_PROC // batch):
        c += len(extract_batch(pdf, gaz))
    return c


def warm(_):
    """Per-worker warm-up: imports + a single 10k batch (running the full
    workload twice would double the tool's runtime for no extra warmth)."""
    _one_batch()
    return 0


def _one_batch():
    import numpy as np
    import pandas as pd

    from __spark_entry__ import _GAZ, _ORGS, _PEOPLE
    from quad_processor_util_spark.oracle import Gazetteer
    from quad_processor_util_spark.plans.extract_vec import extract_batch

    gaz = Gazetteer(_GAZ)
    texts = [
        f"{p} works at {o}." for p in _PEOPLE for o in _ORGS
    ]
    batch = 10_000
    pdf = pd.DataFrame({
        "conv_id": [f"c{i % 97}" for i in range(batch)],
        "turn_idx": np.arange(batch, dtype="int32"),
        "role": ["user"] * batch,
        "text": (texts * (batch // len(texts) + 1))[:batch],
        "tool": [None] * batch,
    })
    extract_batch(pdf, gaz)


def main() -> None:
    # custom counts let the calibration match the engine's MEASURED busy-core
    # occupancy (e.g. `host_ceiling.py 10 21` when /proc sampling shows
    # local[8]≈10 and local[32]≈21 busy cores) — the apples-to-apples
    # per-core-productivity comparison for the upper scaling pairs
    levels = [int(x) for x in sys.argv[1:]] or [2, 4, 8, 16, 32]
    rates: dict[int, float] = {}
    for n in levels:
        # initializer warms EVERY worker by construction — map(warm, ...)
        # alone could let a fast worker grab two warm tasks and leave
        # another cold, putting imports + first-call warm-up inside the
        # timed region; the map below is kept as a BARRIER so t0 starts
        # only after every worker is up (its tasks are no-ops post-init)
        with mp.Pool(n, initializer=warm, initargs=(0,)) as p:
            p.map(warm, range(n))
            t0 = time.time()
            p.map(work, range(n))
            dt = time.time() - t0
        rates[n] = ROWS_PER_PROC * n / dt
    pairs = {}
    for lo in levels:
        hi = lo * 4
        if hi in rates:
            pairs[f"{lo}->{hi}"] = round(rates[hi] / rates[lo] / 4, 3)
    # matched-occupancy mode (`host_ceiling.py 11 28`): the useful number is
    # per-proc productivity retention between ADJACENT measured levels —
    # (rate_b/b)/(rate_a/a) — since non-4:1 custom levels form no 4x pair
    # (review finding: the advertised custom invocation previously computed
    # nothing)
    retention = {}
    for a, b in zip(levels, levels[1:]):
        retention[f"{a}->{b}"] = round(
            (rates[b] / b) / (rates[a] / a), 3)
    print(json.dumps({
        "rows_per_sec": {str(k): round(v) for k, v in rates.items()},
        "pair_efficiency": pairs,
        "per_proc_retention": retention,
        "cores_visible": mp.cpu_count(),
    }))


if __name__ == "__main__":
    main()
