#!/usr/bin/env python3
"""Plan-audit table generator: runs `graft.Explain` (formatted plans
for EVERY registered query) and counts operator classes per query into
the PLANS_r{N}.md table — exchanges, join kinds, aggregates, codegen
spans, pushed-filter scans, and the accident class (CartesianProduct).
Fails (and writes nothing) on a non-zero Explain exit or a block count
that disagrees with Explain's own EXPLAIN_TOTAL marker, so a mid-sweep
crash can never pass as a clean corpus-wide "0 cartesians" audit.

Usage: python3 tools/plans.py <sfDir> <outFile>
Dev-tool only (driver-side python); the shipped library never uses it.
"""
import re
import subprocess
import sys


def main(sf_dir: str, out: str) -> int:
    p = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Explain {sf_dir}"],
        capture_output=True, text=True)
    text = p.stdout
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
        print(f"Explain exited {p.returncode}; no table written")
        return 2
    total = re.search(r"EXPLAIN_TOTAL (\d+)", text)
    # exactly the Explain banner (10 '='), NOT Spark's own
    # "===== Subqueries =====" section header (5 '=') inside a
    # formatted plan — splitting on that counted a scalar-subquery
    # plan's tail as a phantom query
    blocks = re.split(r"={10} (\w+) ={10}", text)
    rows = []
    for i in range(1, len(blocks) - 1, 2):
        name, body = blocks[i], blocks[i + 1]
        def c(pat):
            return len(re.findall(pat, body))
        scans = re.findall(r"PushedFilters: \[([^\]]*)\]", body)
        pushed = sum(1 for s in scans if s.strip())
        # formatted plans print each operator twice (tree + numbered
        # details) — count only the numbered detail headers
        rows.append((
            name,
            c(r"\(\d+\) Exchange\b"),
            c(r"\(\d+\) BroadcastHashJoin"),
            c(r"\(\d+\) SortMergeJoin"),
            c(r"\(\d+\) BroadcastNestedLoopJoin"),
            c(r"\(\d+\) HashAggregate"),
            c(r"\(\d+\) SortAggregate"),
            c(r"WholeStageCodegen"),
            f"{pushed}/{len(scans)}",
            c(r"\(\d+\) CartesianProduct"),
        ))
    if total is None or int(total.group(1)) != len(rows):
        want = total.group(1) if total else "?(marker missing)"
        print(f"PARTIAL AUDIT: parsed {len(rows)} blocks, Explain ran {want}; "
              "no table written")
        return 2
    with open(out, "w") as f:
        f.write(
            "| query | exchanges | bhj | smj | bnlj | hashAgg | sortAgg "
            "| codegen spans | scans w/ pushed filters | cartesian |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write("| " + " | ".join(str(x) for x in r) + " |\n")
    carts = [r[0] for r in rows if r[-1] > 0]
    print(f"{len(rows)} queries audited; cartesians: {carts or 'none'}")
    return 0 if not carts else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
