#!/usr/bin/env python3
"""Unattended TPU-return finisher (ROUND3.md steps 1+3, automated).

The measurement battery (tools/r2_measure.sh) produces ksweep2 rows in its
log; this script picks the fastest OVERFLOW-FREE row, reconstructs that
variant's config overrides (rescaling window sizes by any ``*widen``
auto-retry factor, exactly as ksweep2 did), then runs the 100k drift
protocol at the winning operating point and a final bench — so a brief
TPU recovery is fully captured even with nobody at the keyboard.

  python tools/r3_finish.py --log /tmp/r2m.log

Outputs: /tmp/r3_winner.json (winner + overrides), drift JSONL/checkpoints
under --out, bench lines appended to the log by the caller.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ksweep2 import VARIANTS  # noqa: E402  (tools/ on sys.path via __file__)

ROW = re.compile(
    r"^(?P<label>\w+(?:\*(?P<widen>[\d.]+))?)\s*:\s*"
    r"(?P<ms>[\d.]+) ms/step = \s*(?P<sps>[\d.]+) steps/s.*"
    r"over=\((?P<o1>\d+), (?P<o2>\d+)\)")

WINDOW_KEYS = ("nbr_window", "p2p_window", "m2p_window", "blk_window",
               "sph_exact_window")
BASE_WINDOWS = dict(nbr_window=192, p2p_window=320, m2p_window=192)


def parse_rows(text: str):
    """Valid (overflow-free, known-variant) rows: [(name, widen, steps/s)]."""
    rows = []
    for line in text.splitlines():
        m = ROW.match(line.strip())
        if not m:
            continue
        name = m.group("label").split("*")[0]
        if name not in VARIANTS:
            continue
        if int(m.group("o1")) or int(m.group("o2")):
            continue
        rows.append((name, float(m.group("widen") or 1.0),
                     float(m.group("sps"))))
    return rows


def winner_overrides(name: str, widen: float) -> dict:
    """The full --set override dict reproducing a ksweep2 row's config
    (base windows + variant, window keys widened exactly as the sweep's
    auto-retry did: ceil-to-16 after scaling)."""
    r16 = lambda v: -(-int(v * widen) // 16) * 16
    kw = {k: r16(v) for k, v in BASE_WINDOWS.items()}
    for k, v in VARIANTS[name].items():
        kw[k] = r16(v) if k in WINDOW_KEYS else v
    return kw


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/r2m.log")
    ap.add_argument("--out", default="docs/results/drift100k_v2")
    ap.add_argument("--target", type=int, default=12000)
    ap.add_argument("--drift-attempts", type=int, default=8,
                    help="outer retries around drift100k.py (the TPU "
                         "worker intermittently crashes mid-run; the "
                         "driver resumes from its chunk checkpoints)")
    ap.add_argument("--dry-run", action="store_true",
                    help="pick + print the winner, run nothing")
    args = ap.parse_args()

    with open(args.log) as f:
        text = f.read()
    # only the LAST battery run counts — earlier epochs in the same log
    # may predate code changes and would mis-rank the winner
    marker = "fused-kernel battery ==="
    if marker in text:
        text = text.rsplit(marker, 1)[1]
    rows = parse_rows(text)
    if not rows:
        print(json.dumps({"error": f"no valid ksweep2 rows in {args.log}"}))
        return 1
    name, widen, sps = max(rows, key=lambda r: r[2])
    kw = winner_overrides(name, widen)
    result = {"winner": name, "widen": widen, "steps_per_sec": sps,
              "overrides": kw,
              "rows": [{"name": n, "widen": w, "steps_per_sec": s}
                       for n, w, s in sorted(rows, key=lambda r: -r[2])]}
    with open("/tmp/r3_winner.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    if args.dry_run:
        return 0

    # windows are passed via --windows (drift100k's own auto-widen retries
    # then scale them further on overflow); everything else via --set
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, os.path.join(repo, "tools", "drift100k.py"),
           "--out", args.out, "--target", str(args.target),
           "--windows", "{nbr_window},{p2p_window},{m2p_window}".format(**kw)]
    for k, v in kw.items():
        if k not in BASE_WINDOWS:
            cmd += ["--set", f"{k}={v}"]
    for attempt in range(args.drift_attempts):
        r = subprocess.run(cmd, cwd=repo)
        if r.returncode == 0:
            break
        print(f"drift attempt {attempt + 1} rc={r.returncode}; retrying",
              flush=True)
        time.sleep(120)
    else:
        print(json.dumps({"error": "drift did not complete"}))
        return 1
    return 0


if __name__ == "__main__":
    main()
