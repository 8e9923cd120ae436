"""Compare two bench JSON lines (BENCH_r{N}.json) query by query.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_threshold]

Prints per-query ratios (new/old) for the common subset, the common-subset
total ratio, queries only in one side, and streaming throughput movement.
Exit code 1 if any common query regressed beyond the threshold (default
2.0 — the round-over-round bar the verdicts grade against), OR if a
streaming lane's rows/sec dropped by more than STREAM_DROP (30%) — the
round-6 contract that turns the streaming numbers from a chart into a
gate. Streaming runs are 8-batch and noisy at ±15%, so the 30% bar
flags real plan regressions without tripping on scheduler jitter.

Round 12: REFUSES to compare when both sides resolve to the identical
record (same ``run_id``, or equal dicts for pre-run_id records) — the
BENCH_LOCAL fallback is overwritten per run, so a torn OLD artifact
could silently self-compare at 1.00x (it happened to r10->r11).
Recovery path: ``BENCH_HISTORY.jsonl``, the append-only per-round
archive bench.py writes beside BENCH_LOCAL.json. Also prints both
records' ``streaming_warmup_discarded`` flags and labels cross-protocol
streaming comparisons (pre-r11 tails metered the first lane cold).
"""

from __future__ import annotations

import json
import sys

#: a streaming lane dropping more than this fraction of its rows/sec
#: round-over-round fails the compare (see module docstring).
STREAM_DROP = 0.30


def _scan(text: str) -> dict | None:
    """A bench record anywhere in captured text, scanned from the END
    (truncation eats the front). A full record (no ``compact`` marker)
    beats the compact trailing summary bench.py prints as its
    truncation-proof second line; driver ``{"tail": ...}`` wrappers
    recurse one level."""
    fallback = None
    for candidate in (text, *reversed(text.splitlines())):
        candidate = candidate.strip()
        if not candidate.startswith("{"):
            continue
        try:
            d = json.loads(candidate)
        except json.JSONDecodeError:
            continue
        if "queries" in d:
            if d.get("compact"):
                fallback = fallback or d
                continue
            return d
        if "tail" in d and isinstance(d["tail"], str):
            got = _scan(d["tail"])
            if got is not None and not got.get("compact"):
                return got
            fallback = fallback or got
    return fallback


def _load(path: str) -> dict:
    import os

    with open(path) as fh:
        text = fh.read()
    got = _scan(text)
    if got is not None:
        if got.get("compact"):
            print(f"note: {path} truncated past its full record — using "
                  "the compact trailing summary (rows/sec + 2-decimal "
                  "timings only)")
        return got
    # last resort for a torn driver artifact: the committed full-fidelity
    # copy bench.py writes beside itself. Loud, because it may describe a
    # DIFFERENT round than the artifact's filename claims.
    local = os.path.join(os.path.dirname(os.path.abspath(path)), "BENCH_LOCAL.json")
    if os.path.exists(local):
        try:
            with open(local) as fh:
                d = json.load(fh)
        except (OSError, ValueError):
            d = None
        if d and "queries" in d:
            print(f"WARNING: no bench JSON found in {path}; falling back "
                  f"to {local} — verify it describes the intended round")
            return d
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    # self-compare refusal (round 12): the BENCH_LOCAL fallback above is
    # overwritten every run, so a torn OLD artifact can resolve to the
    # very record NEW describes — r10->r11 read 1.00x on all 39 queries
    # behind one warning. A same-run identity is never a comparison;
    # refuse loudly and point at the append-only archive.
    same_id = old.get("run_id") is not None and old.get("run_id") == new.get(
        "run_id"
    )
    if same_id or old == new:
        raise SystemExit(
            "REFUSING to compare: OLD and NEW resolve to the identical "
            "bench record"
            + (f" (run_id {old.get('run_id')})" if same_id else "")
            + " — one side's artifact is unparseable and the fallback "
            "landed on the other's record. Recover the missing round "
            "from BENCH_HISTORY.jsonl (append-only, one full record per "
            "sf0.1 run) and compare against that line instead."
        )
    # streaming-protocol provenance (round 12): rounds before r11
    # metered the session's FIRST streaming lane cold (~30% slow);
    # r11+ discard a session warm-up before metering. Comparing across
    # that protocol change is legitimate but must be LABELED.
    wo = bool(old.get("streaming_warmup_discarded"))
    wn = bool(new.get("streaming_warmup_discarded"))
    print(
        f"streaming protocol: old warmup_discarded={wo}, "
        f"new warmup_discarded={wn}"
        + (
            " — CROSS-PROTOCOL comparison: the un-warmed side's first "
            "lane carries a ~30% cold-JIT penalty; interpret streaming "
            "movement accordingly"
            if wo != wn
            else ""
        )
    )
    oq, nq = old["queries"], new["queries"]
    # host-drift normalization: when BOTH records carry the fixed
    # calibration probe (bench.py `calibration_sec`, round 8+), the gate
    # judges probe-NORMALIZED ratios — a host that measures the same
    # synthetic workload 1.5x slower must not fail queries for moving
    # 1.5x with it. Raw ratios are still printed; the factor is capped
    # below 1 so a FASTER host never hides a real regression.
    cal_o, cal_n = old.get("calibration_sec"), new.get("calibration_sec")
    factor = 1.0
    if cal_o and cal_n:
        factor = max(1.0, cal_n / cal_o)
        print(f"calibration probe: {cal_o:.3f}s -> {cal_n:.3f}s "
              f"(host factor {cal_n / cal_o:.2f}; gate normalizes by "
              f"{factor:.2f})")
        if abs(cal_n / cal_o - 1.0) > 0.25:
            # round 13: the r12 verdict burned its regression budget on a
            # 1.68x host swing read raw — make the invalidity of raw
            # ratios impossible to miss when the probes disagree this much
            print(
                "HOST DRIFT >25%: the two records were measured on hosts "
                "the fixed probe times "
                f"{max(cal_o, cal_n) / min(cal_o, cal_n):.2f}x apart — "
                "RAW ratios between them are NOT comparable; read only "
                "the probe-normalized `norm` column (and treat uniform "
                "movement matching the probe as environment, not code)."
            )
    scan_o, scan_n = old.get("scan_probe_sec"), new.get("scan_probe_sec")
    storage_drift = False
    if scan_o and scan_n:
        # not part of the gate's normalization factor, but ACTIONABLE
        # (round 10): the CPU probe is blind to storage drift (a
        # reclaimed page cache moves scan-bound queries without moving
        # calibration_sec) — when storage moved >1.3x while CPU stayed
        # flat, the attribution is printed here and bench.py already
        # re-ran + recorded the affected set (`storage_drift` in the new
        # record), so a drifted round reads as environment up front
        sfactor = scan_n / scan_o
        storage_drift = sfactor > 1.3 and factor < 1.1
        print(f"scan probe:        {scan_o:.3f}s -> {scan_n:.3f}s "
              f"(storage factor {sfactor:.2f}"
              + ("; STORAGE DRIFTED while CPU flat — expect scan-bound "
                 "ratios to move with it" if storage_drift else "")
              + ")")
    drift_rec = new.get("storage_drift")
    if drift_rec:
        print(f"new record flags storage drift: reran {drift_rec['reran']} "
              f"(storage {drift_rec['storage_factor']}x, "
              f"cpu {drift_rec['cpu_factor']}x)")
    common = sorted(set(oq) & set(nq))
    worst = 0.0
    print(f"{'query':38s} {'old':>7s} {'new':>7s} {'ratio':>6s} {'norm':>6s}")
    for name in sorted(common, key=lambda n: -(nq[n] / max(oq[n], 1e-9))):
        r = nq[name] / max(oq[name], 1e-9)
        worst = max(worst, r / factor)
        flag = " <-- regressed" if r / factor > threshold else ""
        print(
            f"{name:38s} {oq[name]:7.2f} {nq[name]:7.2f} {r:6.2f} "
            f"{r / factor:6.2f}{flag}"
        )
    tot_old = sum(oq[n] for n in common)
    tot_new = sum(nq[n] for n in common)
    print(f"\ncommon subset ({len(common)} queries): "
          f"{tot_old:.2f}s -> {tot_new:.2f}s ({tot_new / max(tot_old, 1e-9):.2f}x)")
    for label, only in (("only-old", set(oq) - set(nq)), ("only-new", set(nq) - set(oq))):
        if only:
            print(f"{label}: {sorted(only)}")
    so, sn = old.get("streaming") or {}, new.get("streaming") or {}
    stream_regressed = False
    for k in sorted(set(so) & set(sn)):
        o_rps = so[k].get("rows_per_sec") or 0.0
        n_rps = sn[k].get("rows_per_sec") or 0.0
        # rows/sec scales with host speed exactly like query timings: a
        # host the probe measures `factor`x slower pushes every lane's
        # throughput down by the same factor with no code change, so the
        # gate judges the probe-CORRECTED throughput (factor is already
        # floored at 1 above — a faster host never hides a regression)
        drop = 1.0 - n_rps / o_rps if o_rps else 0.0
        norm_drop = 1.0 - (n_rps * factor) / o_rps if o_rps else 0.0
        flag = ""
        if norm_drop > STREAM_DROP:
            stream_regressed = True
            flag = f" <-- regressed ({drop:.0%} raw / {norm_drop:.0%} normalized drop)"
        print(
            f"streaming {k}: {o_rps:.0f} -> {n_rps:.0f} rows/s{flag}"
        )
    return 1 if (worst > threshold or stream_regressed) else 0


if __name__ == "__main__":
    raise SystemExit(main())
