#!/usr/bin/env python3
"""Emit STREAMING_r{N}.json — the spec-gate evidence for the streaming
half of the surface, extracted from the ScalaTest JUnit XML reports.

48+ of the SURVEY §2 items are streaming/utility operators the
driver's batch gate cannot run; their gate is `sbt test`. This tool
makes that gate DRIVER-VISIBLE the way CORRECTNESS_r{N}.json is
(VERDICT r13 item 3): per suite, per test → pass/fail/error, plus a
summary — committed alongside the round artifacts so the evidence
trail for the streaming half doesn't require re-running sbt.

Usage: run `sbt test` first (writes target/test-reports/*.xml), then

    python3 tools/streaming_report.py 14        # round number

Exit 0 iff every test in every suite passed.
"""
import glob
import json
import os
import sys
import xml.etree.ElementTree as ET

round_n = int(sys.argv[1]) if len(sys.argv) > 1 else 0
files = sorted(glob.glob("target/test-reports/*.xml"))
if not files:
    sys.exit("no XML under target/test-reports — run `sbt test` first")

# sbt overwrites per-suite XML but never deletes reports of suites
# that no longer exist (a removed/renamed spec, a scratch suite) —
# drop any report whose suite class is gone from the compiled test
# classes, or the artifact counts ghosts
def suite_exists(xml_path):
    cls = os.path.basename(xml_path).removeprefix("TEST-").removesuffix(".xml")
    return os.path.exists(
        "target/scala-2.13/test-classes/" + cls.replace(".", "/") + ".class")
stale = [f for f in files if not suite_exists(f)]
for f in stale:
    print("skipping stale report (suite no longer exists):", f, file=sys.stderr)
files = [f for f in files if suite_exists(f)]

suites = {}
total = passed = failed = 0
for f in files:
    root = ET.parse(f).getroot()
    suite_nodes = [root] if root.tag == "testsuite" else root.findall("testsuite")
    for s in suite_nodes:
        name = s.get("name", f)
        tests = {}
        for tc in s.findall("testcase"):
            tn = tc.get("name", "?")
            if tc.find("failure") is not None:
                tests[tn] = "fail"
                failed += 1
            elif tc.find("error") is not None:
                tests[tn] = "error"
                failed += 1
            elif tc.find("skipped") is not None:
                tests[tn] = "skipped"
            else:
                tests[tn] = "pass"
                passed += 1
            total += 1
        if tests:
            suites.setdefault(name, {}).update(tests)

out = {
    "round": round_n,
    "suites": suites,
    "summary": {"suites": len(suites), "tests": total,
                "passed": passed, "failed": failed},
}
path = "STREAMING_r%02d.json" % round_n if round_n else "STREAMING.json"
with open(path, "w") as fh:
    json.dump(out, fh, indent=1, sort_keys=True)
print("%s: %d suites, %d tests, %d passed, %d failed"
      % (path, len(suites), total, passed, failed))
sys.exit(0 if failed == 0 and total > 0 else 1)
