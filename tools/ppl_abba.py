"""ABBA drift-cancelling 2v8 draw for the perplexity-buckets leg.

The box's memory bus decays and recovers on ~10-minute scales (see
BENCH.md round-5 ABBA sections); a one-shot 2-then-8 draw aliases that
drift into the ratio. This runs the legs in 2,8,8,2 order (each leg a
pinned fresh JVM via curation_scaling.run_leg, min-of-2 op runs), so a
linear drift inflates one 8-core leg and deflates the other; the
paired ratios bracket the true value and the best-leg estimator
min(2c)/(4*min(8c)) is robust to one-sided contamination.

usage: python tools/ppl_abba.py [replicas] [op]
writes BENCH_PPL_ABBA.json (op=ppl) / BENCH_<OP>_ABBA.json
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

ROOT = Path(__file__).resolve().parent.parent
ILOCK = Path("/tmp/sparktiles_interactive.lock")


def leg(cpus: int, replicas: int, op: str) -> dict:
    cmd = [sys.executable, str(ROOT / "tools/curation_scaling.py"),
           "--leg", str(cpus), str(replicas), op]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=str(ROOT))
    line = next((l for l in proc.stdout.splitlines()
                 if l.startswith("LEGRESULT ")), None)
    if line is None:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError(f"leg {cpus} failed")
    return json.loads(line[len("LEGRESULT "):])


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    op = sys.argv[2] if len(sys.argv) > 2 else "ppl"

    from curation_scaling import control
    ctl = control()
    held = ILOCK.exists()
    if not held:
        ILOCK.touch()
    try:
        order = [2, 8, 8, 2]
        legs = [leg(c, replicas, op) for c in order]
    finally:
        if not held:
            ILOCK.unlink(missing_ok=True)
    t = [l[f"{op}_s"] for l in legs]
    pair_a = t[0] / (4 * t[1])   # first 2c vs first 8c
    pair_b = t[3] / (4 * t[2])   # last 2c vs last 8c
    best = min(t[0], t[3]) / (4 * min(t[1], t[2]))
    result = {
        "op": op, "replicas": replicas,
        "n_docs": legs[0]["n_docs"],
        "control_at_start": {
            "compute_eff": ctl["compute"]["efficiency"],
            "bandwidth_eff": ctl["bandwidth"]["efficiency"]},
        "order": order,
        "legs": legs,
        "eff_pair_first": round(pair_a, 3),
        "eff_pair_last": round(pair_b, 3),
        "eff_bracket": [round(min(pair_a, pair_b), 3),
                        round(max(pair_a, pair_b), 3)],
        "eff_best_leg": round(best, 3),
    }
    try:
        ctl2 = control()
        result["control_at_end"] = {
            "compute_eff": ctl2["compute"]["efficiency"],
            "bandwidth_eff": ctl2["bandwidth"]["efficiency"]}
    except Exception:
        pass
    print(json.dumps(result, indent=1))
    Path(ROOT / f"BENCH_{op.upper()}_ABBA.json").write_text(
        json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
