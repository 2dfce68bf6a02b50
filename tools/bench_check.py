#!/usr/bin/env python3
"""Mechanical BASELINE.md regression check over a bench.json line.

Big-7 rule (r13): the seven refreshed-every-round pins flag at 1.25x
instead of 1.5x -- see BIG7 below.

Usage: python3 tools/bench_check.py [target/bench.json] [target/bench_diag.json]

Applies exactly the rule BASELINE.md states: per-query flag when
t > max(1.5*p, p + 0.3), with every pin scaled by (run total / pinned
total) first when the totals differ by more than 15% (host-speed
normalization), plus the order-invariant paired pins for the
shared-cache families. Exit 0 = zero flags.

When the per-pass diag file (bench_diag.json, JSONL — written by Bench
next to bench.json) is present, it is also checked for in-JVM anomalies
so a host-window debate never recurs (VERDICT r10 #7): flag any
query-pass with gc_ms > GC_MS_MAX or persisted storage above
STORE_MB_MAX (r10 healthy sweep: GC <= 53 ms/query, storage flat <= 6 MB
— the thresholds sit an order of magnitude above healthy, so a flag
means a real in-JVM pathology, not noise).
"""
import json, os, re, sys

GC_MS_MAX = 2000      # per query-pass
STORE_MB_MAX = 256    # persisted mem+disk high-water

# The big-7 (VERDICT r12 #7): the seven most expensive queries, whose
# pins are refreshed EVERY round from paired fresh-JVM SPARK_GRAFT_ONLY
# min-of-2 runs (BASELINE.md "Big-7 pin refresh"), so they get a tighter
# multiplier -- q7F drifted 31% for two rounds under the generic 1.5x
# rule before r13 caught it. The +0.3s additive floor still applies
# (all seven are >1s, so 1.25x dominates in practice).
BIG7_FLAG = 1.25
BIG7 = {"q7F_lang_id", "q7G_ann_ivf", "q7S_ann_ivfpq", "q7T_bpe_train",
        "q7N_dedup_jaccard", "q7R_dedup_components", "q7A_dedup_minhash",
        # r16: the composed pipeline is now the registry's second most
        # expensive row -- same refresh-every-round + 1.25x discipline
        "q7X_pipeline_funnel"}

PAIRED = [
    ("q7N+q7R", ["q7N_dedup_jaccard", "q7R_dedup_components"], 2.7),
    ("q7G+q7S", ["q7G_ann_ivf", "q7S_ann_ivfpq"], 2.4),
    ("q7T+q7U", ["q7T_bpe_train", "q7U_bpe_tokenize"], 0.9),
    # round 10: the whole shingle family rides q7A's cache — order-
    # invariant subtotal, same flag rule (BASELINE.md "Paired pin —
    # shingle family")
    ("shingle-family", ["q7A_dedup_minhash", "q7N_dedup_jaccard",
                        "q7P_decontaminate", "q7R_dedup_components",
                        "q7W_dedup_spans"], 5.2),
    # round 16: the composed pipeline rides the jaccard/stars caches
    # q7N/q7R build, so its rows are order-dependent the same way --
    # the order-invariant subtotal is the binding pin
    ("pipeline-family", ["q7N_dedup_jaccard", "q7R_dedup_components",
                         "q7X_pipeline_funnel", "q7Y_pipeline_schedule"], 6.7),
]

def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
    print(f"judging {path}")
    d = json.loads(open(path).read())
    if "queries" in d:
        qs = d["queries"]
    elif "tail" in d:
        # Driver-format BENCH_r{N}.json (VERDICT r13 #4): the driver
        # stores the bench one-liner inside a possibly FRONT-TRUNCATED
        # stdout "tail" string, so json.loads can't see a queries dict.
        # Recover every intact "qXX":sec pair by regex -- a pair cut at
        # the truncation boundary simply fails the pattern and is
        # skipped, degrading to "fewer pinned queries checked", never a
        # KeyError.
        qs = {m.group(1): float(m.group(2))
              for m in re.finditer(r'"(q\w+)":([0-9.]+)', d["tail"])}
        print(f"driver-format file: recovered {len(qs)} query timings "
              f"from the stdout tail")
        if not qs:
            print("no query timings recoverable from tail")
            return 2
    else:
        print("unrecognized bench format: no 'queries' dict, no 'tail'")
        return 2
    # Anchor the pin parse to the per-query table's own span (ADVICE
    # r16), the same anchoring repin_baseline.py uses: a future
    # BASELINE.md section sharing the `| qXX | n.nn |` row shape (a
    # history table, a per-host appendix) must not inject bogus pins
    # into the CI-gating rule.
    btext = open("BASELINE.md").read()
    tbl_hdr = btext.index("| query | pinned sec |")
    tbl_end = btext.index("| **total** |", tbl_hdr)
    pins = {m.group(1): float(m.group(2))
            for m in re.finditer(r"\| (q\w+) \| ([\d.]+) \|",
                                 btext[tbl_hdr:tbl_end])}
    both = [q for q in qs if q in pins]
    run_total = sum(qs[q] for q in both)
    pinned_total = sum(pins[q] for q in both)
    ratio = run_total / pinned_total
    # normalization trigger 10% (r15, was 15%): the same r15 HEAD read
    # 40.84s and 46.84s whole-registry totals twenty minutes apart on an
    # idle host -- a 14.7% benign window spread that sat exactly in the
    # 15% rule's blind spot and flagged a big-7 row (q7A x1.28) with no
    # plan change anywhere. Per-query regressions are PLAN defects and
    # therefore relative; scale earlier.
    scale = ratio if abs(ratio - 1) > 0.10 else 1.0
    print(f"run {run_total:.2f}s vs pinned {pinned_total:.2f}s "
          f"(ratio {ratio:.3f}, scale {scale:.3f}); "
          f"{len(both)} pinned, {len(set(qs) - set(pins))} unpinned")
    if scale != 1.0:
        # ADVICE r15: once normalization engages, a genuinely uniform
        # regression is scaled away and flagged by no per-query rule --
        # nothing gates the absolute total. Make that visible in CI
        # logs instead of silently absorbing it: a slow host reads this
        # and moves on; a real whole-run regression reads this and
        # investigates (or re-pins with a written triage).
        print(f"  WARN: whole-run drift {100 * (ratio - 1):+.1f}% absorbed by "
              f"normalization -- per-query rules below judge PLAN drift "
              f"only; adjudicate the absolute total by hand (host load vs "
              f"real uniform regression) before trusting a clean run")
    flags = []
    for q in both:
        p = pins[q] * scale
        mult = BIG7_FLAG if q in BIG7 else 1.5
        if qs[q] > max(mult * p, p + 0.3):
            flags.append(f"  FLAG {q}: {qs[q]:.2f}s vs pin {pins[q]:.2f}s "
                         f"(scaled {p:.2f}, x{mult})")
    for name, keys, pin in PAIRED:
        missing = [k for k in keys if k not in qs]
        if missing:
            print(f"paired {name}: SKIP (missing {missing})")
            continue
        s = sum(qs[k] for k in keys)
        bad = s > max(1.5 * pin, pin + 0.3)
        print(f"paired {name}: {s:.2f}s vs pin {pin}s -> {'FLAG' if bad else 'ok'}")
        if bad:
            flags.append(f"  FLAG paired {name}: {s:.2f}s vs pin {pin}s")

    diag_path = (sys.argv[2] if len(sys.argv) > 2
                 else os.path.join(os.path.dirname(path) or ".", "bench_diag.json"))
    if not os.path.exists(diag_path) and len(sys.argv) <= 2:
        # Round-artifact naming (VERDICT r14 #7): a committed
        # BENCH_r{N}.json / BENCHFULL_r{N}.json has its per-pass diag
        # next to it as BENCHDIAG_r{N}.jsonl, not bench_diag.json --
        # look there so driver-format runs get the full rule too.
        m = re.match(r"BENCH(?:FULL)?_r(\d+)\.json$", os.path.basename(path))
        if m:
            cand = os.path.join(os.path.dirname(path) or ".",
                                f"BENCHDIAG_r{m.group(1)}.jsonl")
            if os.path.exists(cand):
                diag_path = cand
    if os.path.exists(diag_path):
        print(f"judging diag {diag_path}")
        # .get defaults throughout: a truncated last line from an
        # interrupted bench (or a partial row) must degrade to a warning,
        # never abort the whole check with a KeyError
        rows = []
        for i, l in enumerate(open(diag_path)):
            if not l.strip():
                continue
            try:
                rows.append(json.loads(l))
            except json.JSONDecodeError:
                print(f"diag: WARNING skipping unparseable line {i + 1}")
        gc_max = max((r.get("gc_ms", 0) for r in rows), default=0)
        st_max = max((r.get("store_mb", 0) + r.get("store_disk_mb", 0)
                      for r in rows), default=0)
        heap_max = max((r.get("heap_mb", 0) for r in rows), default=0)
        print(f"diag: {len(rows)} rows, gc_ms max {gc_max}, "
              f"store mem+disk max {st_max} MB, heap_mb max {heap_max}")
        for r in rows:
            if r.get("gc_ms", 0) > GC_MS_MAX:
                flags.append(f"  FLAG diag gc {r.get('q')} pass {r.get('pass')}: "
                             f"{r.get('gc_ms', 0)} ms > {GC_MS_MAX}")
            store = r.get("store_mb", 0) + r.get("store_disk_mb", 0)
            if store > STORE_MB_MAX:
                flags.append(f"  FLAG diag storage {r.get('q')} pass {r.get('pass')}: "
                             f"mem+disk {store} MB > {STORE_MB_MAX}")
    else:
        print(f"diag: {diag_path} absent (time rule only)")
    if flags:
        print("\n".join(["FLAGS:"] + flags))
        return 1
    print("zero flags")
    return 0

if __name__ == "__main__":
    sys.exit(main())
