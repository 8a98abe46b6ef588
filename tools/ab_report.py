#!/usr/bin/env python3
"""Tabulate streaming A/B bench artifacts (round-15 adjudication).

Usage: python3 tools/ab_report.py /tmp/ab_*.json
Prints one row per run: per-engine median rate + raw samples + the
loadavg the artifact recorded, so the factor isolation reads straight
off the table.
"""
import json
import sys

ENGINES = ["v1", "v1_rocksdb", "v2", "composed", "lateness", "cascade"]
KEY = {
    "v1": "streaming_events_per_sec",
    "v1_rocksdb": "streaming_v1rocksdb_events_per_sec",
    "v2": "streaming_v2_events_per_sec",
    "composed": "streaming_composed_events_per_sec",
    "lateness": "streaming_lateness_events_per_sec",
    "cascade": "streaming_cascade_events_per_sec",
}


def main(paths):
    print(f"{'run':<22}" + "".join(f"{e:>12}" for e in ENGINES) + "  load@stream")
    rows = []
    for p in sorted(paths):
        d = json.load(open(p))
        name = p.split("/")[-1].replace(".json", "").replace("ab_", "")
        det = d.get("streaming_detail", {})
        row = {e: d.get(KEY[e], -1) for e in ENGINES}
        rows.append((name, row, d))
        print(f"{name:<22}" + "".join(f"{row[e]:>12}" for e in ENGINES)
              + f"  {d.get('loadavg_streaming', '?')}")
        for e in ENGINES:
            s = det.get(e, {})
            print(f"    {e:<12} warm={s.get('warmup_replays', '?')} "
                  f"samples={s.get('samples_rate', '?')}")
    return rows


if __name__ == "__main__":
    main(sys.argv[1:])
