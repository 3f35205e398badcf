#!/usr/bin/env python
"""Loader worker-scaling sanity check for real multi-core hosts.

BASELINE.md's multi-chip projection assumes reader processes scale the h5
loader's throughput with core count ("3-4 reader cores suffice") — an
assumption this repo's 1-core build harness cannot test (N forked readers
share one core and measure *slower* there, r4). This check runs on the
target VM before training starts (the gcloud launcher's generated script
invokes it) and records the actual scaling curve in the job log:

    python tools/loader_scaling_check.py [-n 40000] [--img-size 64]

Prints one line per worker count and a PASS/WARN verdict: PASS when any
multi-worker configuration beats single-process throughput by ≥1.3×
(readers scale; the projection's premise holds on this host), WARN
otherwise (size the host's reader count by this table, not the model).
Always exits 0 — it is a measurement, not a gate."""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(path: str, num_workers: int, batch_size: int, img_size: int,
            n_batches: int) -> float:
    from sky_embeddings_tpu.data.h5_loader import build_h5_batcher

    batcher = build_h5_batcher(
        path, batch_size=batch_size, img_size=img_size, shuffle=True,
        num_workers=num_workers,
    )
    stream = batcher.forever()
    next(stream)  # warm up (worker spawn, first chunk)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(stream)
    dt = time.perf_counter() - t0
    if hasattr(batcher, "close"):
        batcher.close()
    return n_batches * batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=40000, help="synthetic corpus size")
    ap.add_argument("--img-size", type=int, default=64)
    ap.add_argument("--channels", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--batches", type=int, default=60)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4, 8])
    args = ap.parse_args()

    from sky_embeddings_tpu.data.synthetic import write_synthetic_h5

    ncpu = os.cpu_count() or 1
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "scaling.h5")
        write_synthetic_h5(path, n=args.n, channels=args.channels,
                           img_size=args.img_size, seed=0)
        rates = {}
        for w in args.workers:
            rates[w] = measure(path, w, args.batch_size, args.img_size,
                               args.batches)
            print(f"loader num_workers={w}: {rates[w]:9.0f} img/s "
                  f"({ncpu} cores on host)", flush=True)

    base = rates.get(0) or next(iter(rates.values()))
    best_w = max(rates, key=rates.get)
    speedup = rates[best_w] / base
    verdict = "PASS" if (best_w != 0 and speedup >= 1.3) else "WARN"
    print(f"loader-scaling {verdict}: best num_workers={best_w} at "
          f"{rates[best_w]:.0f} img/s ({speedup:.2f}x single-process). "
          + ("Readers scale on this host." if verdict == "PASS" else
         "Workers do not beat in-process reading here — set num_workers "
         "from this table (BASELINE.md multi-chip projection note)."),
          flush=True)


if __name__ == "__main__":
    main()
