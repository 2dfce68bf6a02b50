#!/usr/bin/env python3
"""Re-pin BASELINE.md's per-query regression table from a fresh
builder-format bench artifact (target/bench.json — min-of-2 per query).

Usage: python3 tools/repin_baseline.py [bench.json] [--write]

Without --write, prints the would-be table and the old-vs-new summary
(drift per query, totals) for review. With --write, rewrites every
`| qXX | sec |` row in BASELINE.md in place (and the `| **total** |`
row), leaving all prose untouched — the re-pin rationale paragraph is
edited by hand, per the r7/r13 precedent.
"""
import json, re, sys

def main():
    path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "target/bench.json"
    write = "--write" in sys.argv
    d = json.loads(open(path).read())
    qs = d["queries"]
    text = open("BASELINE.md").read()
    # Read pins from the per-query table only (same anchoring as the
    # --write path below) so a future section sharing the row shape
    # can't inject bogus "pinned" entries into the drift report.
    tbl_hdr = text.index("| query | pinned sec |")
    tbl_end = text.index("| **total** |", tbl_hdr)
    old = {m.group(1): float(m.group(2))
           for m in re.finditer(r"\| (q\w+) \| ([\d.]+) \|",
                                text[tbl_hdr:tbl_end])}
    missing = [q for q in old if q not in qs]
    extra = [q for q in qs if q not in old]
    if missing:
        print(f"ERROR: bench lacks pinned queries: {missing}")
        return 2
    if extra:
        print(f"note: unpinned queries in bench (rows appended): {extra}")
    drifts = sorted(((qs[q] / old[q] if old[q] else 0, q) for q in old),
                    reverse=True)
    print(f"old total {sum(old.values()):.2f}s -> new total "
          f"{sum(qs[q] for q in old):.2f}s")
    print("largest drifts (new/old):")
    for r, q in drifts[:8]:
        print(f"  {q}: {old[q]:.3f} -> {qs[q]:.3f} ({r:.2f}x)")
    if not write:
        print("(dry run; pass --write to apply)")
        return 0
    def repl(m):
        return f"| {m.group(1)} | {qs[m.group(1)]:.3f} |"
    # Anchor the rewrite to the per-query table's own line range
    # (ADVICE r15): a file-wide re.sub over the `| qXX | n.nn |` row
    # shape would silently rewrite any future table/history section
    # that happens to share it. Locate the table by its unique header,
    # end at its `| **total** |` row, and substitute only in between.
    hdr = text.index("| query | pinned sec |")
    end = text.index("| **total** |", hdr)
    end = text.index("\n", end) + 1  # include the total row's line
    block = text[hdr:end]
    block = re.sub(r"\| (q\w+) \| [\d.]+ \|", repl, block)
    total = sum(qs[q] for q in old)
    block = re.sub(r"\| \*\*total\*\* \| \*\*[\d.]+\*\* \|",
                   f"| **total** | **{total:.1f}** |", block)
    text = text[:hdr] + block + text[end:]
    open("BASELINE.md", "w").write(text)
    print(f"BASELINE.md re-pinned: {len(old)} rows, total {total:.1f}s")
    return 0

if __name__ == "__main__":
    sys.exit(main())
