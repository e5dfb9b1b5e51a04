"""Per-op timing breakdown of the headline train step on the real chip.

Reuses bench.py's jitted multi-step (ONE compile — separate per-stage jits
don't fit the remote tunnel's compile budget), captures a jax.profiler trace
around one call, and parses the xplane offline with xprof to print the top
device ops by self time.  This is the SURVEY.md §5.1 profiling loop used to
pick the next Pallas target.

    JAX_PLATFORMS='' python scripts/profile_breakdown.py [top=25]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    top = int(kv.get("top", 25))

    import jax

    import bench

    state, batch, step_fn, mesh = bench.build()
    for _ in range(2):
        state, aux = step_fn(state, batch)
        float(aux["loss"])

    logdir = tempfile.mkdtemp(prefix="asr_tpu_xprof_")
    jax.profiler.start_trace(logdir)
    state, aux = step_fn(state, batch)
    float(aux["loss"])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{logdir}/**/*xplane.pb", recursive=True)
    from xprof.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data(paths, "framework_op_stats",
                                       {"tqx": "out:csv;"})
    with open("/tmp/framework_op_stats.json", "wb") as fh:
        fh.write(data if isinstance(data, bytes) else data.encode())
    tables = json.loads(data)
    if not isinstance(tables, list):
        tables = [tables]
    steps = bench.MEASURE_STEPS + 1
    print(f"{'op type':22s} {'name':42s} {'ms/step':>8s} {'%dev':>6s}  occ/step")
    rows = []
    for table in tables:
        cols = [c["id"] for c in table["cols"]]
        for r in table["rows"]:
            d = dict(zip(cols, [c["v"] for c in r["c"]]))
            if d.get("host_or_device") != "Device":
                continue
            rows.append(d)
    rows.sort(key=lambda d: -d["total_self_time"])
    total_ms = sum(d["total_self_time"] for d in rows) / 1e3 / steps
    for d in rows[:top]:
        print(f"{d['type'][:22]:22s} {d['operation'][:42]:42s} "
              f"{d['total_self_time'] / 1e3 / steps:8.3f} "
              f"{d['device_total_self_time_percent']:6.2f}  "
              f"{d['occurrences'] / steps:.1f}")
    print(f"{'TOTAL device self time':65s} {total_ms:8.3f} ms/step")
    shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
