#!/usr/bin/env python3
"""Dev-only bench regression gate (not part of the shipped library).

Compares a new bench result against the previous round's artifact and
fails (exit 1) when:
  - the new result is unusable: rc != 0, missing/empty query map
    (the round-4 failure mode: a compile error left the bench empty and
    nothing noticed), or
  - any query regresses more than THRESHOLD x vs the old artifact
    (both sides above MIN_SEC, so sub-jitter queries don't trip), or
  - more than 20% of the old queries vanished from the new map
    (a silently shrunk suite reads as "faster" otherwise).

Accepts both formats:
  - raw graft.Bench stdout line: {"metric":"total",...,"queries":{...}}
  - driver BENCH_r*.json wrapper: {"n":..,"rc":..,"tail":"..json line.."}

Usage:
  python3 tools/benchdiff.py <new.json> <old.json> [threshold] [min_sec]
  python3 tools/benchdiff.py --selftest
"""
import json
import sys

THRESHOLD = 1.5
MIN_SEC = 0.4
MISSING_FRAC = 0.2


def extract(obj):
    """-> (rc or None, queries dict). Handles raw + driver-wrapper forms."""
    rc = obj.get("rc")
    if "queries" in obj and isinstance(obj["queries"], dict):
        return rc, obj["queries"]
    parsed = obj.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return rc, parsed["queries"]
    tail = obj.get("tail", "")
    i = tail.find('"queries":{')
    if i >= 0:
        seg = tail[i + len('"queries":'):]
        depth = 0
        for j, ch in enumerate(seg):
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    return rc, json.loads(seg[: j + 1])
    return rc, {}


def diff(new_obj, old_obj, threshold=THRESHOLD, min_sec=MIN_SEC):
    """-> list of failure strings (empty = gate passes)."""
    fails = []
    rc, new_q = extract(new_obj)
    if rc not in (None, 0):
        fails.append(f"new bench rc={rc} (expected 0)")
    if not new_q:
        fails.append("new bench has an EMPTY query map (r4 failure mode)")
        return fails
    _, old_q = extract(old_obj)
    if not old_q:
        return fails  # nothing to diff against; usability checks only
    missing = [q for q in old_q if q not in new_q]
    if len(missing) > MISSING_FRAC * len(old_q):
        fails.append(
            f"{len(missing)}/{len(old_q)} old queries missing from new bench: "
            f"{sorted(missing)[:5]}…")
    for q in sorted(old_q):
        if q not in new_q:
            continue
        old_t, new_t = old_q[q], new_q[q]
        if old_t < min_sec and new_t < min_sec:
            continue  # both inside the jitter floor
        if old_t > 0 and new_t / old_t > threshold:
            fails.append(
                f"{q} regressed {new_t / old_t:.2f}x ({old_t:.2f}s -> {new_t:.2f}s)")
    return fails


def selftest():
    ok = {"rc": 0, "queries": {"q1": 1.0, "q2": 0.1, "q3": 2.0}}
    # planted regression must trip
    bad = {"rc": 0, "queries": {"q1": 1.9, "q2": 0.1, "q3": 2.0}}
    assert any("q1 regressed" in f for f in diff(bad, ok)), "planted regression missed"
    # sub-floor jitter must not trip
    jit = {"rc": 0, "queries": {"q1": 1.0, "q2": 0.3, "q3": 2.0}}
    assert diff(jit, ok) == [], f"jitter tripped the gate: {diff(jit, ok)}"
    # empty map must trip
    assert any("EMPTY" in f for f in diff({"rc": 0, "queries": {}}, ok))
    # rc != 0 must trip
    assert any("rc=1" in f for f in diff({"rc": 1, "queries": {"q1": 1.0}}, ok))
    # shrunk suite must trip
    shrunk = {"rc": 0, "queries": {"q1": 1.0}}
    assert any("missing" in f for f in diff(shrunk, ok))
    # driver-wrapper tail parsing
    wrapped = {"rc": 0, "tail": 'xx{"metric":"total","queries":{"q1":1.0,"q3":2.0}}'}
    assert extract(wrapped)[1] == {"q1": 1.0, "q3": 2.0}
    # new queries are free; improvements are free
    grown = {"rc": 0, "queries": {"q1": 0.2, "q2": 0.1, "q3": 2.0, "q4": 9.0}}
    assert diff(grown, ok) == []
    print("selftest OK")


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    with open(sys.argv[1]) as f:
        new_obj = json.load(f)
    with open(sys.argv[2]) as f:
        old_obj = json.load(f)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else THRESHOLD
    min_sec = float(sys.argv[4]) if len(sys.argv) > 4 else MIN_SEC
    fails = diff(new_obj, old_obj, threshold, min_sec)
    _, new_q = extract(new_obj)
    _, old_q = extract(old_obj)
    both = [q for q in old_q if q in new_q]
    if both:
        tot_old = sum(old_q[q] for q in both)
        tot_new = sum(new_q[q] for q in both)
        print(f"comparable total: {tot_old:.1f}s -> {tot_new:.1f}s "
              f"({tot_new / tot_old:.2f}x) over {len(both)} queries")
    for f_ in fails:
        print(f"FAIL {f_}")
    if not fails:
        print("bench gate PASS")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
