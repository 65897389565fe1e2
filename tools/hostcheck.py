#!/usr/bin/env python3
"""Host-quietness canary: measure fresh-page fault throughput.

This box is a VM on a memory-oversubscribed host. Under host pressure,
first-touch page faults go to the hypervisor and cost 0.1-1 ms EACH —
measured in round 9: touching 1 GiB of fresh pages took >300 s versus
~0.3 s on a quiet host, while a no-allocation CPU spin slowed only
1.7x. That makes allocation-heavy phases (a growing JVM heap,
BigDecimal churn in decimal aggregates, shuffle buffers) randomly
10-100x slower, which is the root cause of every "regression" that
vanished on re-measure in rounds 4/7/8 (and of round 8's
q_province_rollup 15.4 s outlier).

Run this BEFORE any benchmark you intend to trust:

    python3 tools/hostcheck.py        # exit 0 = quiet, 1 = pressured

Quiet threshold: >=1000 MB/s fresh-touch (a healthy VM does >3000).
Also prints steal%% over a 2 s window (steal ~= busy means the
hypervisor is taking half the cycles).
"""
import sys
import time

MB = 256

def touch_rate():
    t0 = time.time()
    buf = bytearray(MB << 20)
    step = 4096
    for i in range(0, len(buf), step):
        buf[i] = 1
    return MB / (time.time() - t0)

def steal_pct():
    def snap():
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        vals = list(map(int, f[1:]))
        idle = vals[3] if len(vals) > 3 else 0
        iowait = vals[4] if len(vals) > 4 else 0
        steal = vals[7] if len(vals) > 7 else 0
        # busy = user nice system irq softirq. iowait is excluded like
        # idle: proc(5) calls it time the CPU was IDLE waiting on I/O,
        # and counting it busy would deflate steal%% on I/O-bound hosts
        # exactly where the gate should be wary (review r11). guest/
        # guest_nice (cols 8-9) are already included in user/nice per
        # proc(5) -- summing them double-counts guest time and
        # understates steal%% when the host is busiest (mirrors
        # Bench.scala)
        busy = sum(vals[:8]) - idle - iowait - steal
        return busy, steal
    b0, s0 = snap()
    time.sleep(2)
    b1, s1 = snap()
    db, ds = b1 - b0, s1 - s0
    # an idle box has a tiny denominator and the ratio is meaningless
    # noise — steal only tells you anything while the box is working
    if db + ds < 100:
        return None
    return 100.0 * ds / (db + ds)

if __name__ == "__main__":
    rate = touch_rate()
    st = steal_pct()
    quiet = rate >= 1000
    steal_txt = "steal n/a (box idle)" if st is None else f"steal {st:.0f}% of busy+steal"
    print(f"fresh-page touch: {rate:.0f} MB/s ({MB} MiB probe); "
          f"{steal_txt} -> "
          f"{'QUIET - timings trustworthy' if quiet else 'PRESSURED - do not trust timings'}")
    sys.exit(0 if quiet else 1)
