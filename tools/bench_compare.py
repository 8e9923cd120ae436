"""Compare two bench JSON lines (BENCH_r{N}.json) query by query.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_threshold]

Prints per-query ratios (new/old) for the common subset, the common-subset
total ratio, queries only in one side, and streaming throughput movement.
Exit code 1 if any common query regressed beyond the threshold (default
2.0 — the round-over-round bar the verdicts grade against).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    # BENCH_r files may wrap the JSON line inside a driver record
    for candidate in (text, text.splitlines()[-1]):
        try:
            d = json.loads(candidate)
        except json.JSONDecodeError:
            continue
        if "queries" in d:
            return d
        if "tail" in d:  # driver wrapper: the bench line is in "tail"
            for line in reversed(d["tail"].splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    worst = 0.0
    print(f"{'query':38s} {'old':>7s} {'new':>7s} {'ratio':>6s}")
    for name in sorted(common, key=lambda n: -(nq[n] / max(oq[n], 1e-9))):
        r = nq[name] / max(oq[name], 1e-9)
        worst = max(worst, r)
        flag = " <-- regressed" if r > threshold else ""
        print(f"{name:38s} {oq[name]:7.2f} {nq[name]:7.2f} {r:6.2f}{flag}")
    tot_old = sum(oq[n] for n in common)
    tot_new = sum(nq[n] for n in common)
    print(f"\ncommon subset ({len(common)} queries): "
          f"{tot_old:.2f}s -> {tot_new:.2f}s ({tot_new / max(tot_old, 1e-9):.2f}x)")
    for label, only in (("only-old", set(oq) - set(nq)), ("only-new", set(nq) - set(oq))):
        if only:
            print(f"{label}: {sorted(only)}")
    so, sn = old.get("streaming") or {}, new.get("streaming") or {}
    for k in sorted(set(so) & set(sn)):
        print(f"streaming {k}: {so[k]['rows_per_sec']:.0f} -> "
              f"{sn[k]['rows_per_sec']:.0f} rows/s")
    return 1 if worst > threshold else 0


if __name__ == "__main__":
    raise SystemExit(main())
