#!/usr/bin/env python3
"""Compare a bench capture against the pinned baseline.

    python3 tools/bench_compare.py BENCH_r09.json   # or target/bench.json

Accepts either the driver's round artifact ({"n":..,"tail":"..<json>.."})
or Bench's own JSON line / target/bench.json. Prints per-query ratios
vs BASELINE_LOCAL.md, the host-telemetry verdict when present, and a
summary that applies the noise discipline from BASELINE_LOCAL.md:
interference only inflates timings, so a capture-wide inflation with a
pressured host verdict is box noise, while a query whose ratio stays
high across quiet captures is a real regression candidate — re-probe
it in isolation (SPARK_GRAFT_ONLY=<q> SPARK_GRAFT_REPS=2) on a
hostcheck-quiet box before believing it.
"""
import json
import re
import sys


def load_capture(path):
    with open(path) as fh:
        raw = fh.read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    # driver artifact: the bench JSON line is embedded in a "tail" blob
    # (possibly truncated at the front); fall back to scraping the last
    # {"metric":...} line out of whatever text we have
    text = d.get("tail", raw) if isinstance(d, dict) else raw
    best = None
    for m in re.finditer(r'\{"metric":.*', text):
        try:
            best = json.loads(m.group(0).splitlines()[0])
        except json.JSONDecodeError:
            continue
    if best is None:
        # front-truncated tail (the round-8 capture bug): the "{"metric"
        # prefix is gone but the per-query pairs survive — scrape them
        pairs = dict((m.group(1), float(m.group(2))) for m in
                     re.finditer(r'"(q\w+)":([0-9.]+)', text))
        if not pairs:
            sys.exit(f"no bench JSON found in {path}")
        print(f"note: {path} is front-truncated; scraped "
              f"{len(pairs)} query pairs, no total/host fields")
        return {"queries": pairs}
    return best


def load_baseline():
    pinned = {}
    with open("BASELINE_LOCAL.md") as fh:
        for line in fh:
            m = re.match(r"\|\s*(q\w+)\s*\|\s*([0-9.]+)\s*\|", line)
            if m:
                pinned[m.group(1)] = float(m.group(2))
    if not pinned:
        sys.exit("BASELINE_LOCAL.md has no pinned rows")
    return pinned


def main():
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    cap = load_capture(sys.argv[1])
    pinned = load_baseline()
    qs = cap.get("queries", {})
    host = cap.get("host")

    rows = []
    for q, s in sorted(qs.items()):
        base = pinned.get(q)
        rows.append((q, s, base, (s / base) if base else None))

    over = [(q, s, b, r) for q, s, b, r in rows if r and r > 2.0]
    missing = sorted(set(pinned) - set(qs))
    new = sorted(set(qs) - set(pinned))

    print(f"{'query':36s} {'sec':>8s} {'pinned':>8s} {'ratio':>7s}")
    for q, s, b, r in rows:
        mark = " <-- >2x" if r and r > 2.0 else ""
        print(f"{q:36s} {s:8.2f} "
              + (f"{b:8.2f} {r:7.2f}" if b else f"{'--':>8s} {'--':>7s}")
              + mark)

    total = sum(s for _, s, _, _ in rows)
    base_total = sum(b for _, _, b, _ in rows if b)
    print(f"\ntotal {total:.1f}s vs pinned-min sum {base_total:.1f}s "
          f"(minima compose optimistically; a quiet full run lands ~1.1x over)")
    if host:
        t = min(host.get("touch_mb_s_before", 0), host.get("touch_mb_s_after", 0))
        quiet = t >= 1000 and host.get("steal_pct", 0) < 20
        print(f"host: touch {host.get('touch_mb_s_before')}/"
              f"{host.get('touch_mb_s_after')} MB/s, "
              f"steal {host.get('steal_pct')}% -> "
              f"{'QUIET (capture trustworthy)' if quiet else 'PRESSURED (inflations are box noise)'}")
    else:
        print("host: no telemetry in capture (pre-round-9 Bench)")
    if over:
        print(f"\n{len(over)} queries over the 2x gate in this capture:")
        for q, s, b, r in over:
            print(f"  {q}: {s:.2f}s vs {b:.2f}s pinned ({r:.1f}x) — "
                  f"re-probe isolated on a hostcheck-quiet box before calling it real")
    else:
        print("\nno query over the 2x gate")
    if missing:
        print(f"missing from capture ({len(missing)}): {', '.join(missing)}")
    if new:
        print(f"not yet pinned ({len(new)}): {', '.join(new)} — "
              f"re-run tools/pin_baseline.py after capturing quiet runs")


if __name__ == "__main__":
    main()
