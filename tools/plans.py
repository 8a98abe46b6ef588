#!/usr/bin/env python3
"""Plan-audit table generator: runs `graft.Explain` (EXECUTES every
registered query, then prints its formatted FINAL plan) and counts
operator classes per query into the PLANS_r{N}.md table — exchanges,
join kinds, aggregates, codegen spans, pushed-filter scans, and the
accident class (CartesianProduct). Fails (and writes nothing) on a
non-zero Explain exit or a block count that disagrees with Explain's
own EXPLAIN_TOTAL marker, so a mid-sweep crash can never pass as a
clean corpus-wide "0 cartesians" audit.

Codegen spans = distinct `[codegen id : N]` annotations per plan, which
only exist on EXECUTED plans (a pre-execution AQE plan carries none —
the column read 0 for every query in rounds 6-12). A query whose span
count drops to 0 while the baseline table (the previous PLANS_r*.md,
auto-discovered or passed as the 3rd arg) recorded spans > 0 fails the
audit: that is exactly the shape of a native expression silently
falling out of whole-stage codegen.

Usage: python3 tools/plans.py <sfDir> <outFile> [baselinePlansFile]
Dev-tool only (driver-side python); the shipped library never uses it.
"""
import glob
import os
import re
import subprocess
import sys


def load_baseline_spans(out: str, explicit: str | None) -> tuple[str, dict]:
    """Previous round's per-query span counts, from the highest-numbered
    PLANS_r*.md next to the output file (or an explicit path)."""
    if explicit:
        path = explicit
    else:
        cands = glob.glob(os.path.join(os.path.dirname(out) or ".", "PLANS_r*.md"))
        cands = [(int(m.group(1)), p) for p in cands
                 if (m := re.search(r"PLANS_r(\d+)\.md$", p))
                 and os.path.abspath(p) != os.path.abspath(out)]
        if not cands:
            return "", {}
        path = max(cands)[1]
    spans = {}
    with open(path) as f:
        for line in f:
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            # | query | exchanges | bhj | smj | bnlj | hashAgg | sortAgg
            # | codegen spans | scans | cartesian |
            if len(cells) == 10 and cells[7].isdigit():
                spans[cells[0]] = int(cells[7])
    return path, spans


def main(sf_dir: str, out: str, baseline: str | None = None) -> int:
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
        # Executed AQE plans print BOTH a "== Final Plan ==" and an
        # "== Initial Plan ==" tree, and the numbered operator details
        # cover both — counting every detail header would double-count
        # each adaptive query's operators. Count only operators that
        # are NOT initial-plan-exclusive: ids in an Initial tree but in
        # no Final tree are the pre-AQE shadow. Non-adaptive (sub)plans
        # have neither marker and keep all their ids.
        fin_ids = set()
        for sec in re.findall(r"== Final Plan ==(.*?)(?:== Initial Plan ==|\Z)",
                              body, re.S):
            fin_ids |= set(re.findall(r"\((\d+)\)", sec))
        init_ids = set()
        for sec in re.findall(r"== Initial Plan ==(.*?)(?:\n\n|\Z)", body, re.S):
            init_ids |= set(re.findall(r"\((\d+)\)", sec))
        drop = init_ids - fin_ids
        kinds = [k for (oid, k)
                 in re.findall(r"(?m)^\((\d+)\) (\w+)", body)
                 if oid not in drop]
        def c(kind):
            return sum(1 for k in kinds if k == kind)
        scans = re.findall(r"PushedFilters: \[([^\]]*)\]", body)
        pushed = sum(1 for s in scans if s.strip())
        rows.append((
            name,
            c("Exchange"),
            c("BroadcastHashJoin"),
            c("SortMergeJoin"),
            c("BroadcastNestedLoopJoin"),
            c("HashAggregate"),
            c("SortAggregate"),
            len(set(re.findall(r"codegen id : (\d+)", body))),
            f"{pushed}/{len(scans)}",
            c("CartesianProduct"),
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
    base_path, base_spans = load_baseline_spans(out, baseline)
    lost = [r[0] for r in rows if base_spans.get(r[0], 0) > 0 and r[7] == 0]
    print(f"{len(rows)} queries audited; cartesians: {carts or 'none'}; "
          f"codegen-span losses vs {base_path or '(no baseline)'}: "
          f"{lost or 'none'}")
    return 0 if not carts and not lost else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
