"""Measure aggregate DRAM bandwidth at several process counts (STREAM-triad
style) to substantiate the 8->32 scaling-saturation attribution in
BENCH.md §1 / BASELINE.md (round-4 verdict #7: the claim that the in-session
8->32 efficiency collapse is single-socket memory-bandwidth saturation, not
an engine defect, was plausible but unmeasured).

Each worker runs `c = a + s * b` (triad: 3 arrays touched -> 24 bytes/elem
per pass at float64) over arrays far larger than LLC, in its OWN process
(no GIL interaction; numpy releases the GIL anyway, but processes also give
separate allocators). Aggregate GB/s per width is the sum of worker rates
over the measurement window.

Usage: python scripts/mem_bandwidth_probe.py [--widths 1,8,32]
       [--mb 256] [--secs 3]
Prints one JSON line: {"widths": {"1": GBps, ...}, "ratio_8_to_32": ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def _worker(mb: int, secs: float, barrier, out) -> None:
    n = mb * 1024 * 1024 // 8
    a = np.full(n, 1.25)
    b = np.full(n, 2.5)
    c = np.empty(n)
    np.add(a, b, out=c)  # warm up / page-fault everything in
    # align the measurement window across workers: without this, early
    # workers measure while late ones are still page-faulting 768 MB in,
    # and the "concurrent" aggregate is nothing of the sort
    barrier.wait()
    passes = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < secs:
        np.multiply(b, 1.000001, out=c)
        np.add(a, c, out=c)  # triad: read a, read b, write c
        passes += 1
    dt = time.monotonic() - t0
    out.put(24.0 * n * passes / dt / 1e9)  # GB/s for this worker


def measure(width: int, mb: int, secs: float) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(width)
    ps = [mp.Process(target=_worker, args=(mb, secs, barrier, q))
          for _ in range(width)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(rates), 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="1,8,32")
    ap.add_argument("--mb", type=int, default=256,
                    help="array size per worker in MB (3 arrays each)")
    ap.add_argument("--secs", type=float, default=3.0)
    args = ap.parse_args()

    widths = [int(w) for w in args.widths.split(",")]
    res = {str(w): measure(w, args.mb, args.secs) for w in widths}
    out = {"triad_gbps": res, "mb_per_array": args.mb}
    if "8" in res and "32" in res and res["8"]:
        # a ratio near 1.0 means the socket was already saturated at 8
        # workers: 4x more threads move no more bytes, so any memory-bound
        # stage CANNOT scale 8->32 regardless of the execution plan
        out["bw_ratio_8_to_32"] = round(res["32"] / res["8"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
