"""Opportunistic runner for curation_scaling legs on a noisy VM.

Same gating discipline as tools/scaling_watch.py (which targets the
tile legs): loop the cheap 2v8 compute+bandwidth control; fire one
pinned curation_scaling run only when the cores AND the memory bus
are real right now. Exists because the ppl leg's only round-5 draws
fired at bandwidth_eff 0.62/0.72 — the tokenize-heavy scan is the
most bus-sensitive leg in the curation family, and a starved-bus
ratio says nothing about engine structure.

usage: python tools/curation_watch.py [max_hours] [replicas] [ops] [be_gate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
ILOCK = Path("/tmp/sparktiles_interactive.lock")
SLOCK = Path("/tmp/sparktiles_scaling.lock")
OUT = ROOT / "BENCH_CURATION_WATCH_ATTEMPTS.jsonl"
CE_GATE = 0.85


def control() -> dict:
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools/hw_scaling_control.py"), "2", "8"],
        capture_output=True, text=True, cwd=str(ROOT), timeout=600)
    out = proc.stdout.strip()
    ctl = json.loads(out[out.index("{"):])
    subprocess.run(["git", "checkout", "--", "BENCH_HW_CONTROL.json"],
                   cwd=str(ROOT), capture_output=True)
    return ctl


def main():
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    ops = sys.argv[3] if len(sys.argv) > 3 else "ppl"
    be_gate = float(sys.argv[4]) if len(sys.argv) > 4 else 0.75
    deadline = time.time() + max_hours * 3600
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        if ILOCK.exists() or SLOCK.exists():
            print(f"[cwatch] attempt {attempt}: lock present, sleeping",
                  flush=True)
            time.sleep(180)
            continue
        load1 = os.getloadavg()[0]
        if load1 > 4.0:
            print(f"[cwatch] attempt {attempt}: load {load1:.1f}, sleeping",
                  flush=True)
            time.sleep(480)
            continue
        ctl = control()
        ce = ctl["compute"]["efficiency"]
        be = ctl["bandwidth"]["efficiency"]
        rec = {"ts": time.time(), "attempt": attempt, "load1": load1,
               "compute_eff": ce, "bandwidth_eff": be, "ops": ops}
        print(f"[cwatch] attempt {attempt}: ce={ce} be={be} "
              f"load={load1:.1f}", flush=True)
        # band, not floor: an efficiency ABOVE ~1 is not a great box,
        # it is a contaminated control (another job stole cycles from
        # the 2-core leg — the 2026-08-19 be=1.446 fire happened
        # exactly this way, into a 32-core funnel run)
        if not (CE_GATE <= ce <= 1.15) or not (be_gate <= be <= 1.05):
            rec["fired"] = False
            with OUT.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            time.sleep(420)
            continue
        if ILOCK.exists() or SLOCK.exists():
            # a heavy job started while the control ran — don't fire
            rec["fired"] = False
            rec["late_lock"] = True
            with OUT.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            time.sleep(180)
            continue
        out_file = ROOT / ("BENCH_CURATION_SCALING_%s.json"
                           % "_".join(ops.split(",")))
        try:
            subprocess.run(
                [sys.executable, str(ROOT / "tools/curation_scaling.py"),
                 str(replicas), "2", "8", ops],
                capture_output=True, text=True, cwd=str(ROOT), timeout=5400)
            run = json.loads(out_file.read_text())
        except Exception as e:  # timeout or parse — journal and move on
            run = {"error": f"{type(e).__name__}: {e}"}
        rec["fired"] = True
        rec["run"] = run
        try:
            ctl_after = control()
            rec["bandwidth_eff_after"] = ctl_after["bandwidth"]["efficiency"]
            rec["compute_eff_after"] = ctl_after["compute"]["efficiency"]
        except Exception:
            rec["bandwidth_eff_after"] = None
        with OUT.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        effs = [v for k, v in run.items()
                if k.startswith("scaling_efficiency_")]
        if effs and min(effs) >= 0.8 and (rec.get("bandwidth_eff_after")
                                          or 0) >= be_gate - 0.15:
            print(f"[cwatch] clean draw {effs} — stopping", flush=True)
            return
        time.sleep(300)
    print("[cwatch] deadline reached", flush=True)


if __name__ == "__main__":
    main()
