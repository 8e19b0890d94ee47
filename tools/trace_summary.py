#!/usr/bin/env python3
"""Summarize a jax.profiler xplane trace: top HLO ops by self time.

Usage:
  python tools/trace_summary.py [trace_dir] [--top N] [--by-category]

Pairs with utils/profiling.trace; the Unity-Profiler analog for finding
where a step actually spends its time (per-op self time with source-file
attribution via the tensorboard profile plugin's hlo_stats converter).
"""

import argparse
import glob
import json
import re
import sys


def load(trace_dir):
    from xprof.convert import raw_to_tool_data as rtd
    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        sys.exit(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data([files[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    j = json.loads(data)
    cols = [c["label"] for c in j["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in j["rows"]]
    return cols, rows


def src_of(info):
    if not info:
        return ""
    m = re.findall(r"([\w./]+\.py:\d+)", info)
    keep = [s for s in m if "planetmodel" in s]
    return keep[0].split("planetmodel_sph_tpu/")[-1] if keep else ""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/jaxtrace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by-category", action="store_true")
    args = ap.parse_args()

    cols, rows = load(args.trace_dir)
    i = {k: cols.index(k) for k in
         ("HLO op category", "HLO op name", "#Occurrences",
          "Total self time (us)", "Total self time (%)", "Bound by",
          "Source Info")}
    total_us = sum(r[i["Total self time (us)"]] or 0 for r in rows)
    print(f"total device self time: {total_us/1e3:.1f} ms "
          f"over {len(rows)} ops")

    if args.by_category:
        agg = {}
        for r in rows:
            c = r[i["HLO op category"]]
            agg[c] = agg.get(c, 0.0) + (r[i["Total self time (us)"]] or 0)
        for c, us in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"{us/1e3:10.2f} ms  {100*us/total_us:5.1f}%  {c}")
        return

    rows.sort(key=lambda r: -(r[i["Total self time (us)"]] or 0))
    print(f"{'self ms':>9} {'%':>5} {'occ':>5}  {'category':18} "
          f"{'op':28} source")
    for r in rows[:args.top]:
        us = r[i["Total self time (us)"]] or 0
        print(f"{us/1e3:9.2f} {100*us/total_us:5.1f} "
              f"{int(r[i['#Occurrences']] or 0):5d}  "
              f"{(r[i['HLO op category']] or '')[:18]:18} "
              f"{(r[i['HLO op name']] or '')[:28]:28} "
              f"{src_of(r[i['Source Info']])}")


if __name__ == "__main__":
    main()
