#!/usr/bin/env python3
"""Mechanical BASELINE.md regression check over a bench.json line.

Usage: python3 tools/bench_check.py [target/bench.json]

Applies exactly the rule BASELINE.md states: per-query flag when
t > max(1.5*p, p + 0.3), with every pin scaled by (run total / pinned
total) first when the totals differ by more than 15% (host-speed
normalization), plus the order-invariant paired pins for the
shared-cache families. Exit 0 = zero flags.
"""
import json, re, sys

PAIRED = [
    ("q7N+q7R", ["q7N_dedup_jaccard", "q7R_dedup_components"], 6.8),
    ("q7G+q7S", ["q7G_ann_ivf", "q7S_ann_ivfpq"], 4.9),
    ("q7T+q7U", ["q7T_bpe_train", "q7U_bpe_tokenize"], 5.9),
    # round 10: the whole shingle family rides q7A's cache — order-
    # invariant subtotal, same flag rule (BASELINE.md "Paired pin —
    # shingle family")
    ("shingle-family", ["q7A_dedup_minhash", "q7N_dedup_jaccard",
                        "q7P_decontaminate", "q7R_dedup_components",
                        "q7W_dedup_spans"], 7.1),
]

def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "target/bench.json"
    d = json.loads(open(path).read())
    qs = d["queries"]
    pins = {m.group(1): float(m.group(2))
            for m in re.finditer(r"\| (q\w+) \| ([\d.]+) \|", open("BASELINE.md").read())}
    both = [q for q in qs if q in pins]
    run_total = sum(qs[q] for q in both)
    pinned_total = sum(pins[q] for q in both)
    ratio = run_total / pinned_total
    scale = ratio if abs(ratio - 1) > 0.15 else 1.0
    print(f"run {run_total:.2f}s vs pinned {pinned_total:.2f}s "
          f"(ratio {ratio:.3f}, scale {scale:.3f}); "
          f"{len(both)} pinned, {len(set(qs) - set(pins))} unpinned")
    flags = []
    for q in both:
        p = pins[q] * scale
        if qs[q] > max(1.5 * p, p + 0.3):
            flags.append(f"  FLAG {q}: {qs[q]:.2f}s vs pin {pins[q]:.2f}s (scaled {p:.2f})")
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
    if flags:
        print("\n".join(["FLAGS:"] + flags))
        return 1
    print("zero flags")
    return 0

if __name__ == "__main__":
    sys.exit(main())
