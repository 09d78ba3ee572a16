"""Hardware scaling controls for interpreting BENCH_SCALING numbers.

Measures what THIS box allows when scaling 2 -> 8 pinned single-core
processes, bracketing any engine measurement between two ceilings:

- bandwidth control: streaming numpy add/multiply over 400 MB arrays
  (pure memory traffic). On a one-socket VM the bus saturates; this is
  the floor any shuffle/Arrow/parquet-heavy phase is pulled toward.
- compute control: cache-resident numpy sin loop (pure ALU). This is
  the ceiling; ~1.0 means the cores are real and unshared.

A cluster's N -> 4N adds sockets/NICs/disks, so the bandwidth term
scales ~linearly there; on this VM it cannot. Engine efficiency should
be read against these brackets, not against 1.0.

usage: python tools/hw_scaling_control.py [n_low n_high]
writes BENCH_HW_CONTROL.json
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

BW_SNIPPET = """
import numpy as np, time
n = 50_000_000
a = np.random.default_rng(0).random(n)
b = np.empty_like(a)
t0 = time.time(); iters = 12
for _ in range(iters):
    np.add(a, 1.0, out=b)
    np.multiply(b, 0.5, out=a)
print((n * 8 * 4 * iters) / (time.time() - t0) / 1e9)
"""

CPU_SNIPPET = """
import numpy as np, time
a = np.random.default_rng(0).random(100_000)
t0 = time.time(); iters = 4000
for _ in range(iters):
    a = np.sin(a) * 1.0001
print(iters * len(a) / (time.time() - t0) / 1e6)
"""


def run_procs(snippet: str, k: int) -> float:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(snippet)
        path = f.name
    procs = [
        subprocess.Popen(["taskset", "-c", str(i), sys.executable, path],
                         stdout=subprocess.PIPE, text=True)
        for i in range(k)
    ]
    total = sum(float(p.communicate()[0]) for p in procs)
    Path(path).unlink()
    return total


def main():
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = {"n_low": n_low, "n_high": n_high, "ts": time.time()}
    for name, snip, unit in (("bandwidth", BW_SNIPPET, "GB/s"),
                             ("compute", CPU_SNIPPET, "Mops/s")):
        lo = run_procs(snip, n_low)
        hi = run_procs(snip, n_high)
        out[name] = {
            f"total_{n_low}p": round(lo, 1), f"total_{n_high}p": round(hi, 1),
            "unit": unit,
            "efficiency": round((hi / lo) / (n_high / n_low), 3),
        }
    print(json.dumps(out, indent=1))
    Path("BENCH_HW_CONTROL.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
