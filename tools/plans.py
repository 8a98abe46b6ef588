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


def load_baseline(out: str, explicit: str | None) -> tuple[str, dict, dict]:
    """Previous round's per-query (codegen-span, ObjectHashAggregate)
    counts, from the highest-numbered PLANS_r*.md next to the output
    file (or an explicit path). Handles both the 10-column pre-r14
    table (no objHashAgg column; spans at index 7) and the 11-column
    current one (objHashAgg at 6, spans at 8)."""
    if explicit:
        path = explicit
    else:
        cands = glob.glob(os.path.join(os.path.dirname(out) or ".", "PLANS_r*.md"))
        cands = [(int(m.group(1)), p) for p in cands
                 if (m := re.search(r"PLANS_r(\d+)\.md$", p))
                 and os.path.abspath(p) != os.path.abspath(out)]
        if not cands:
            return "", {}, {}
        path = max(cands)[1]
    spans, objaggs = {}, {}
    with open(path) as f:
        for line in f:
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            # 10 cols: | query | exchanges | bhj | smj | bnlj | hashAgg
            #          | sortAgg | codegen spans | scans | cartesian |
            # 11 cols: same with objHashAgg inserted after hashAgg
            if len(cells) == 10 and cells[7].isdigit():
                spans[cells[0]] = int(cells[7])
            elif len(cells) == 11 and cells[8].isdigit():
                spans[cells[0]] = int(cells[8])
                if cells[6].isdigit():
                    objaggs[cells[0]] = int(cells[6])
    return path, spans, objaggs


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
        # the Initial tree section ends at the next "== " header or the
        # first line-start numbered operator detail "(N) Kind" — NOT at
        # the first blank line, which a formatted-layout change (or a
        # blank line inside the tree body) would silently move, skewing
        # the id-drop set and every operator count downstream
        init_ids = set()
        for sec in re.findall(
                r"== Initial Plan ==(.*?)(?=\n== |\n\(\d+\) |\Z)", body, re.S):
            init_ids |= set(re.findall(r"\((\d+)\)", sec))
        drop = init_ids - fin_ids
        kinds = [k for (oid, k)
                 in re.findall(r"(?m)^\((\d+)\) (\w+)", body)
                 if oid not in drop]
        def c(kind):
            return sum(1 for k in kinds if k == kind)
        scans = re.findall(r"PushedFilters: \[([^\]]*)\]", body)
        pushed = sum(1 for s in scans if s.strip())
        # ObjectHashAggregate is its own column, NOT folded into hashAgg
        # (exact token matching is what made the typed-Aggregator path
        # invisible through r13; substring matching would conflate the
        # two and hide an ObjectHashAggregate→SortAggregate demotion
        # inside a stable-looking hashAgg count)
        rows.append((
            name,
            c("Exchange"),
            c("BroadcastHashJoin"),
            c("SortMergeJoin"),
            c("BroadcastNestedLoopJoin"),
            c("HashAggregate"),
            c("ObjectHashAggregate"),
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
            "| query | exchanges | bhj | smj | bnlj | hashAgg | objHashAgg "
            "| sortAgg | codegen spans | scans w/ pushed filters | cartesian |\n")
        f.write("|---|---|---|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write("| " + " | ".join(str(x) for x in r) + " |\n")
    carts = [r[0] for r in rows if r[-1] > 0]
    base_path, base_spans, base_objaggs = load_baseline(out, baseline)
    lost = [r[0] for r in rows if base_spans.get(r[0], 0) > 0 and r[8] == 0]
    # an ObjectHashAggregate that vanishes means the typed-Aggregator
    # path got demoted to its sort-based fallback (spill threshold,
    # buffer type change) — the same silent-regression class as a
    # codegen-span loss, so it fails the sweep the same way
    obj_lost = [r[0] for r in rows
                if base_objaggs.get(r[0], 0) > 0 and r[6] == 0]
    print(f"{len(rows)} queries audited; cartesians: {carts or 'none'}; "
          f"codegen-span losses vs {base_path or '(no baseline)'}: "
          f"{lost or 'none'}; objHashAgg losses: {obj_lost or 'none'}")
    return 0 if not carts and not lost and not obj_lost else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
