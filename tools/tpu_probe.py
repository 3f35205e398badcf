#!/usr/bin/env python
"""Fast TPU-availability probe.

When the tunneled device backend is down, ``jax.devices()`` blocks inside
the PJRT C API for ~25 minutes before raising UNAVAILABLE — long enough
that every stage of a multi-stage measurement script eats the full stall
(observed 2026-08-18: both ab_pipeline runs burned their whole time budget
on failed backend inits). This probe runs the init in a child process with
a hard deadline so callers learn "up" or "down" in seconds.

Exit code 0 = a device answered a real computation; 1 = init failed or
timed out. Usage::

    python tools/tpu_probe.py [--timeout 90]
"""

import argparse
import subprocess
import sys

CHILD = (
    "import jax, jax.numpy as jnp;"
    "print('devices:', jax.devices());"
    "print('probe_sum:', float(jnp.ones((8, 8)).sum()))"
)


def probe(timeout: float = 90.0) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-u", "-c", CHILD],
            timeout=timeout, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"tpu_probe: backend init exceeded {timeout:.0f}s — down",
              file=sys.stderr)
        return False
    if out.returncode != 0:
        tail = "\n".join(out.stderr.strip().splitlines()[-3:])
        print(f"tpu_probe: init failed\n{tail}", file=sys.stderr)
        return False
    print(out.stdout.strip())
    return True


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=90.0)
    args = ap.parse_args()
    sys.exit(0 if probe(args.timeout) else 1)
