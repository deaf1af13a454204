#!/usr/bin/env python3
"""Round-over-round bench adjudication by MEDIANS.

Compares two `bench_full.json` artifacts (each carries per-query
min-of-N in `samples` and median-of-N in `medians`) and prints the
median-ratio table the round NOTES cite: a query whose MIN regressed
but whose MEDIAN is flat was ambient machine noise; a query whose
median moved is structural and gets adjudicated the round it appears.

Usage: tools/median_ratios.py OLD_bench_full.json NEW_bench_full.json [top_n]
"""
import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    om, nm = old["medians"], new["medians"]
    # `samples` holds the per-run time lists; min-of-N is their min
    os_ = {q: min(v) for q, v in old["samples"].items() if v}
    ns = {q: min(v) for q, v in new["samples"].items() if v}
    common = sorted(set(om) & set(nm))
    rows = []
    for q in common:
        if om[q] <= 0:
            continue
        rows.append((nm[q] / om[q], q, om[q], nm[q],
                     os_.get(q, float("nan")), ns.get(q, float("nan"))))
    rows.sort(reverse=True)
    if rows:
        tot_old = sum(om[q] for _, q, *_ in rows)
        tot_new = sum(nm[q] for _, q, *_ in rows)
        rs = sorted(r for r, *_ in rows)
        n = len(rs)
        med_ratio = (rs[n // 2] if n % 2 else
                     (rs[n // 2 - 1] + rs[n // 2]) / 2)
        print(f"common queries: {len(rows)}   "
              f"median-total {tot_old:.1f}s -> {tot_new:.1f}s "
              f"({tot_new / tot_old:.3f}x)   per-query median ratio "
              f"{med_ratio:.3f}x")
    else:
        print("no common queries between the two artifacts")
    print(f"{'query':<34} {'med_old':>8} {'med_new':>8} {'ratio':>6} "
          f"{'min_old':>8} {'min_new':>8}")
    for r, q, mo, mn_, so, sn in rows[:top_n]:
        print(f"{q:<34} {mo:>8.2f} {mn_:>8.2f} {r:>6.2f} "
              f"{so:>8.2f} {sn:>8.2f}")
    new_only = sorted(set(nm) - set(om))
    if new_only:
        print("\nnew queries this round:")
        for q in new_only:
            print(f"{q:<34} {'':>8} {nm[q]:>8.2f}")


if __name__ == "__main__":
    main()
