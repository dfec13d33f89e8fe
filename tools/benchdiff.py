#!/usr/bin/env python3
"""Dev-only bench regression gate (not part of the shipped library).

Compares a new bench result against the previous round's artifact and
fails (exit 1) when:
  - the new result is unusable: rc != 0, missing/empty query map
    (the round-4 failure mode: a compile error left the bench empty and
    nothing noticed), or
  - the new result reports per-query errors (Bench emits
    "errors":["q…"] when a query throws — a broken query must not read
    as a fast one), or
  - the OLD side parses to an empty query map ("0 comparable queries"
    is a gate failure, not a pass-through: round 6's official artifact
    was truncated mid-marker and the gate silently degraded to
    usability checks only), or covers under half of the current suite
    (a truncated baseline surviving as a few regex-harvested pairs
    leaves the check just as vacuous), or
  - any query regresses more than THRESHOLD x plus ABS_SLACK seconds
    vs the old artifact (both sides above MIN_SEC, so sub-jitter
    queries don't trip, and sub-second wobble needs a real absolute
    delta to count), or
  - more than 20% of the old queries vanished from the new map
    (a silently shrunk suite reads as "faster" otherwise).

Accepts both formats:
  - raw graft.Bench stdout line: {"metric":"total",...,"queries":{...}}
  - driver BENCH_r*.json wrapper: {"n":..,"rc":..,"tail":"..json line.."}
    The driver truncates "tail" from the FRONT, which can cut the
    '"queries":{' marker (BENCH_r06: tail begins ':{"q01_…'); three
    extractors run in order: marker scan -> first '{"q' brace-balanced
    map -> regex harvest of "qNN_name":float pairs.

Usage:
  python3 tools/benchdiff.py <new.json> <old.json> [threshold] [min_sec]
  python3 tools/benchdiff.py --selftest
"""
import json
import re
import sys

THRESHOLD = 1.5
MIN_SEC = 0.4
# A flagged regression must ALSO exceed this many absolute seconds
# beyond threshold*old: sub-second queries wobble +-0.2 s run-to-run
# (r8 measured qm3 at 0.52/0.54/0.66 s across three same-code runs —
# a pure ratio on small denominators reads that as 1.5x), while any
# regression that matters at sf0.1 moves the needle by more than this.
ABS_SLACK = 0.3
MISSING_FRAC = 0.2
# comparable pairs must cover at least this fraction of the OLD map: a
# heavily-truncated baseline that still regex-harvests a FEW pairs must
# not pass as "compared" when most of the baseline went unchecked (the
# r6 silent-degradation mode, moved from 0 surviving pairs to a
# handful). Measured against len(old), NOT len(new): queries absent
# from the old map are suite GROWTH with no baseline to regress
# against, and any legitimate >2x one-round growth would otherwise fail
# with a misleading "truncated baseline?" message
OLD_COVER_FRAC = 0.5

# every suite query name starts with "q" (q01_…, qd…, qe…, qm…); the
# lookahead demands a , or } terminator so a value cut mid-digits by the
# driver's tail truncation is dropped instead of mis-parsed
_PAIR_RE = re.compile(
    r'"(q[a-z0-9_]+)"\s*:\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)(?=[,}])')


def _balanced_map(seg):
    """Parse a brace-balanced JSON object from the head of seg, or None."""
    depth = 0
    for j, ch in enumerate(seg):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                try:
                    return json.loads(seg[: j + 1])
                except ValueError:
                    return None
    return None


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
        q = _balanced_map(tail[i + len('"queries":'):])
        if q is not None:
            return rc, q
    # front-truncation cut the marker (BENCH_r06 shape): the queries map
    # is the first {"q…  object in the tail
    i = tail.find('{"q')
    if i >= 0:
        q = _balanced_map(tail[i:])
        if q is not None:
            return rc, q
    # map cut at the END too: harvest whatever "qname":float pairs
    # survived (better a partial diff than a vacuous gate)
    pairs = _PAIR_RE.findall(tail)
    return rc, {k: float(v) for k, v in pairs}


def extract_errors(obj):
    """-> list of failed query names reported by Bench (wrapper-aware)."""
    if isinstance(obj.get("errors"), list):
        return obj["errors"]
    parsed = obj.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("errors"), list):
        return parsed["errors"]
    m = re.search(r'"errors":\[([^\]]*)\]', obj.get("tail", ""))
    if m:
        return [s.strip().strip('"') for s in m.group(1).split(",") if s.strip()]
    return []


def normalize_names(q):
    """Map full query names to their unique id prefix ("qd26_chunking" ->
    "qd26"): graft.Bench's final length-degradation regime renders ids
    only (the suite crossed the tail-capture budget at 86 queries in
    r9), so both sides of the diff normalize through the same prefix to
    stay comparable across regimes. If two keys collide post-normalize
    (a truncation artifact), keep the full names for those — a partial
    diff beats a corrupted one.
    """
    out = {}
    for k, v in q.items():
        nid = k.split("_", 1)[0]
        out[nid] = v if nid not in out else None
    if any(v is None for v in out.values()):
        return q
    return out


def diff(new_obj, old_obj, threshold=THRESHOLD, min_sec=MIN_SEC):
    """-> list of failure strings (empty = gate passes)."""
    fails = []
    rc, new_q = extract(new_obj)
    new_q = normalize_names(new_q) if new_q else new_q
    if rc not in (None, 0):
        fails.append(f"new bench rc={rc} (expected 0)")
    errs = extract_errors(new_obj)
    if errs:
        fails.append(f"new bench reports failed queries: {sorted(errs)}")
    if not new_q:
        fails.append("new bench has an EMPTY query map (r4 failure mode)")
        return fails
    _, old_q = extract(old_obj)
    old_q = normalize_names(old_q) if old_q else old_q
    if not old_q:
        # "nothing to diff against" must be loud: a truncated/unreadable
        # baseline means the regression check never ran (r6 failure mode)
        fails.append("old bench parsed to an EMPTY query map — 0 comparable "
                     "queries, regression check did NOT run")
        return fails
    missing = [q for q in old_q if q not in new_q]
    if len(missing) > MISSING_FRAC * len(old_q):
        # checked BEFORE baseline coverage: a shrunk NEW suite also
        # drops the comparable count, and "truncated baseline?" would be
        # the wrong diagnosis for it
        fails.append(
            f"{len(missing)}/{len(old_q)} old queries missing from new bench: "
            f"{sorted(missing)[:5]}…")
    comparable = [q for q in old_q if q in new_q]
    if len(comparable) < OLD_COVER_FRAC * len(old_q):
        # same failure mode with 1..k surviving pairs instead of 0; the
        # denominator is the OLD map so genuine suite growth (new
        # queries with no baseline) stays free
        fails.append(
            f"only {len(comparable)}/{len(old_q)} baseline queries are "
            f"comparable — truncated baseline or mass rename? regression "
            f"check would be vacuous")
        return fails
    if len(old_q) < OLD_COVER_FRAC * len(new_q):
        # a baseline that is a valid map but much smaller than the
        # current suite is EITHER a truncated artifact whose harvested
        # pairs all happen to survive, or a legitimate >2x one-round
        # suite growth — can't tell them apart here, so fail loudly and
        # say so instead of silently under-checking
        fails.append(
            f"baseline has only {len(old_q)} queries vs {len(new_q)} in the "
            f"new suite — truncated baseline, or the suite more than "
            f"doubled this round (then re-run against a fuller baseline or "
            f"accept the reduced coverage explicitly)")
        return fails
    # r18 (VERDICT r17 item 8): an artifact carrying the load_warn
    # self-flag is contention evidence, not timing evidence — REFUSE
    # per-query adjudication from it instead of merely printing the
    # warning. A contaminated NEW take is itself a gate failure (the
    # evidence for this round is unusable: re-take idle); a contaminated
    # OLD baseline voids the per-query comparison but is not the new
    # code's fault — usability checks above still ran, and main() prints
    # the refusal.
    new_warn = load_info(new_obj)[1]
    old_warn = load_info(old_obj)[1]
    if new_warn:
        fails.append(
            f"new bench self-flagged contaminated ({new_warn}) — not "
            f"evidence; re-take on an idle machine")
    if new_warn or old_warn:
        return fails
    # a query that ERRORED in the old run has a time-to-failure there,
    # not a timing — comparing against it reads any real fix as a
    # regression (r8: q20 "0.08s" was an analysis exception; the r9 fix
    # then showed as "6x slower")
    old_errs = set(extract_errors(old_obj))
    old_errs |= {e.split("_", 1)[0] for e in old_errs}
    for q in sorted(old_q):
        if q not in new_q or q in old_errs:
            continue
        old_t, new_t = old_q[q], new_q[q]
        if old_t < min_sec and new_t < min_sec:
            continue  # both inside the jitter floor
        if old_t > 0 and new_t > old_t * threshold + ABS_SLACK:
            fails.append(
                f"{q} regressed {new_t / old_t:.2f}x ({old_t:.2f}s -> {new_t:.2f}s)")
    return fails


_REGRESS_RE = re.compile(r"^(q\S+) regressed ")


def rerun_cmd(fails, sf_dir="/root/testdata/sf0.1"):
    """The one-command adjudication recipe for a set of flagged
    regressions: re-measure ONLY those queries, min-of-2, on an
    otherwise-idle machine. Three rounds running, the driver's
    full-suite artifact has shown phantom regression clusters
    (machine-level contention through the whole min-of-2 window) that
    this subset re-run dissolves — see BENCH_NOTES.md."""
    names = [m.group(1) for m in map(_REGRESS_RE.match, fails) if m]
    if not names:
        return None
    return (f"SPARK_GRAFT_ONLY={','.join(sorted(set(names)))} "
            f"SPARK_GRAFT_SF_DIR={sf_dir} sbt \"runMain graft.Bench\"")


def load_info(obj):
    """(load, load_warn, canary) from an artifact — wrapper-aware like
    extract(): the driver shape nests the Bench line under "parsed", or
    only in "tail" when front-truncated. load_warn is the r17 self-flag
    a hot-start take carries (see Bench.LoadWarnThreshold); canary is
    the r17 fixed-workload machine-state probe."""
    ld = warn = canary = None
    if isinstance(obj, dict):
        ld = obj.get("load")
        warn = obj.get("load_warn")
        canary = obj.get("canary")
        if isinstance(obj.get("parsed"), dict):
            ld = obj["parsed"].get("load") if ld is None else ld
            warn = obj["parsed"].get("load_warn") if warn is None else warn
            canary = obj["parsed"].get("canary") if canary is None else canary
        tail = obj.get("tail", "") or ""
        if ld is None:
            m = re.search(r'"load":(\[[-+0-9.eE,\s]*\])', tail)
            if m:
                ld = m.group(1)
        if warn is None:
            m = re.search(r'"load_warn":"([^"]*)"', tail)
            if m:
                warn = m.group(1)
        if canary is None:
            m = re.search(r'"canary":([0-9.eE+-]+)', tail)
            if m:
                canary = float(m.group(1))
    return ld, warn, canary


def selftest():
    ok = {"rc": 0, "queries": {"q1": 1.0, "q2": 0.1, "q3": 2.0}}
    # planted regression must trip
    bad = {"rc": 0, "queries": {"q1": 1.9, "q2": 0.1, "q3": 2.0}}
    assert any("q1 regressed" in f for f in diff(bad, ok)), "planted regression missed"
    # sub-floor jitter must not trip
    jit = {"rc": 0, "queries": {"q1": 1.0, "q2": 0.3, "q3": 2.0}}
    assert diff(jit, ok) == [], f"jitter tripped the gate: {diff(jit, ok)}"
    # above-floor sub-second wobble (+0.22s at 1.5x) must not trip:
    # the absolute-slack term absorbs it (the r8 qm3 shape)
    wob = {"rc": 0, "queries": {"q1": 1.0, "q2": 0.1, "q3": 2.0, "q4": 0.66}}
    okw = {"rc": 0, "queries": {"q1": 1.0, "q2": 0.1, "q3": 2.0, "q4": 0.44}}
    assert diff(wob, okw) == [], f"wobble tripped the gate: {diff(wob, okw)}"
    # but a genuine blow-up of a formerly sub-second query still trips
    blow = {"rc": 0, "queries": {"q1": 1.0, "q2": 0.1, "q3": 2.0, "q4": 5.0}}
    assert any("q4 regressed" in f for f in diff(blow, okw)), "blow-up missed"
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
    # BENCH_r06 truncation shape: front-cut tail loses the '"queries":{'
    # marker entirely; the first {"q… object must still be recovered
    r6 = {"rc": 0, "tail": ':{"q01_pricing":0.71,"qd6_minhash":0.68},'
                           '"sf":"/x"}\n[success] Total time: 77 s'}
    assert extract(r6)[1] == {"q01_pricing": 0.71, "qd6_minhash": 0.68}, extract(r6)[1]
    # tail cut at BOTH ends (no closing brace): regex harvest recovers pairs
    both_cut = {"rc": 0, "tail": ':{"q01_pricing":0.71,"qd6_minhash":0.6'}
    assert extract(both_cut)[1] == {"q01_pricing": 0.71}, extract(both_cut)[1]
    # an unreadable OLD side must FAIL, not silently pass usability-only
    assert any("0 comparable" in f
               for f in diff(ok, {"rc": 0, "tail": "…[success]"}))
    # ...and so must a PARTIALLY-readable old side: a truncated baseline
    # that harvests one pair out of a 3-query suite leaves the check
    # vacuous (same r6 mode, 1 surviving pair instead of 0)
    assert any("truncated baseline" in f for f in diff(ok, both_cut)), \
        diff(ok, both_cut)
    # per-query bench errors must trip, raw and wrapper forms
    err_raw = {"rc": 0, "queries": {"q1": 0.1}, "errors": ["q1"]}
    assert any("failed queries" in f for f in diff(err_raw, ok))
    err_tail = {"rc": 0, "tail": '{"metric":"total","queries":{"q1":1.0,"q2":0.1,'
                                 '"q3":2.0},"errors":["q3"],"sf":"/x"}'}
    assert any("failed queries" in f for f in diff(err_tail, ok))
    assert extract_errors(err_tail) == ["q3"]
    # empty errors field is not a failure
    no_err = {"rc": 0, "tail": '{"queries":{"q1":1.0,"q2":0.1,"q3":2.0},"errors":[],"sf":"/x"}'}
    assert diff(no_err, ok) == [], diff(no_err, ok)
    # new queries are free; improvements are free
    grown = {"rc": 0, "queries": {"q1": 0.2, "q2": 0.1, "q3": 2.0, "q4": 9.0}}
    assert diff(grown, ok) == []
    # sub-2x suite growth stays free even when it would have failed the
    # old new-suite-denominator coverage check (3 baseline / 5 new)
    grown5 = {"rc": 0, "queries":
              {"q1": 1.0, "q2": 0.1, "q3": 2.0, "q4": 9.0, "q5": 1.0}}
    assert diff(grown5, ok) == [], diff(grown5, ok)
    # >2x growth (or an equally-shrunk baseline) fails with a message
    # that names BOTH causes instead of just "truncated baseline?"
    grown7 = {"rc": 0, "queries": {f"q{i}": 1.0 for i in range(1, 8)}}
    assert any("more than doubled" in f for f in diff(grown7, ok)), \
        diff(grown7, ok)
    # a baseline truncated to a minority of its own pairs fails even
    # when every surviving pair matches the new suite
    old_bigger = {"rc": 0, "queries":
                  {"q1": 1.0, "q2": 0.1, "qgone_a": 1.0, "qgone_b": 1.0,
                   "qgone_c": 1.0}}
    assert any("baseline queries are comparable" in f
               for f in diff(ok, old_bigger)), diff(ok, old_bigger)
    # an OLD-side errored query's time-to-failure is NOT a baseline: the
    # fixed query's real timing must not read as a regression (r8 q20)
    old_err = {"rc": 0, "queries": {"q1": 1.0, "q2": 0.1, "q3": 0.08},
               "errors": ["q3"]}
    fixed = {"rc": 0, "queries": {"q1": 1.0, "q2": 0.1, "q3": 0.55}}
    assert diff(fixed, old_err) == [], diff(fixed, old_err)
    # ...but the new side reporting errors still trips regardless
    assert any("failed queries" in f for f in diff(old_err, ok))
    # regression failures yield the exact subset re-run command
    cmd = rerun_cmd(diff(bad, ok))
    assert cmd is not None and "SPARK_GRAFT_ONLY=q1 " in cmd, cmd
    assert rerun_cmd(diff(jit, ok)) is None
    # non-regression failures (rc/errors/truncation) get no re-run cmd
    assert rerun_cmd(diff({"rc": 1, "queries": {"q1": 1.0}}, ok)) is None
    # cross-regime: an id-rendered new line (r9 length degradation) must
    # stay comparable against a full-name baseline — and still flag a
    # real regression across the rename
    full_old = {"queries": {"qd26_chunking": 0.5, "qe14_pq_ann": 2.0}}
    id_new_ok = {"queries": {"qd26": 0.5, "qe14": 2.0}}
    id_new_bad = {"queries": {"qd26": 3.5, "qe14": 2.0}}
    assert diff(id_new_ok, full_old) == [], diff(id_new_ok, full_old)
    assert any("qd26" in f for f in diff(id_new_bad, full_old))
    # post-normalize collisions (truncation artifacts) fall back to
    # full names instead of corrupting the map
    coll = {"qd26_chunking": 1.0, "qd26_chunki": 2.0}
    assert normalize_names(coll) == coll
    # r17: the hot-start self-flag and the machine canary surface from
    # all three artifact shapes (raw line, driver wrapper, truncated tail)
    raw_warn = {"load": [6.8, 3.8], "load_warn": "start 6.8 > 3 — x"}
    assert load_info(raw_warn) == ([6.8, 3.8], "start 6.8 > 3 — x", None)
    wrapped_warn = {"parsed": {"load": [6.8, 3.8], "load_warn": "w", "canary": 0.71}}
    assert load_info(wrapped_warn) == ([6.8, 3.8], "w", 0.71)
    tail_warn = {"tail": '…,"load":[6.8,3.8],"load_warn":"start 6.8 > 3","canary":0.52,"sf":0.1}'}
    assert load_info(tail_warn) == ("[6.8,3.8]", "start 6.8 > 3", 0.52)
    assert load_info({"load": [0.1, 2.0], "canary": 0.5}) == ([0.1, 2.0], None, 0.5)
    # r18 (VERDICT r17 item 8): a load_warn artifact gets NO per-query
    # adjudication. New-side flag: gate fails on the contamination itself
    # and the planted regression is NOT separately flagged (not evidence).
    warn_new = {"rc": 0, "queries": {"q1": 1.9, "q2": 0.1, "q3": 2.0},
                "load": [6.8, 1.0], "load_warn": "start 6.8 > 3 — x"}
    wn = diff(warn_new, ok)
    assert any("self-flagged contaminated" in f for f in wn), wn
    assert not any("regressed" in f for f in wn), wn
    # Old-side flag: per-query comparison is void (no false regressions
    # from a hot baseline), usability checks still run, gate passes.
    warn_old = {"rc": 0, "queries": {"q1": 0.5, "q2": 0.1, "q3": 2.0},
                "load": [6.8, 1.0], "load_warn": "start 6.8 > 3 — x"}
    assert diff(bad, warn_old) == [], diff(bad, warn_old)
    assert any("rc=1" in f for f in diff({"rc": 1, "queries": {"q1": 1.0}}, warn_old))
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
    # the summary must count through the SAME name normalization diff()
    # uses, or an id-regime line reads as "comparable=0" while the gate
    # actually compared everything
    new_q = normalize_names(new_q) if new_q else new_q
    old_q = normalize_names(old_q) if old_q else old_q
    both = [q for q in old_q if q in new_q]
    print(f"parsed: new={len(new_q)} old={len(old_q)} comparable={len(both)}")
    if both:
        tot_old = sum(old_q[q] for q in both)
        tot_new = sum(new_q[q] for q in both)
        print(f"comparable total: {tot_old:.1f}s -> {tot_new:.1f}s "
              f"({tot_new / tot_old:.2f}x) over {len(both)} queries")
    for f_ in fails:
        print(f"FAIL {f_}")
    # r14: artifacts may carry the machine's 1-min load average at
    # [start, end] of the run — surface both sides next to any flag so
    # the contention-vs-code question starts answered (six rounds of
    # phantom load clusters motivated this). Wrapper-aware like
    # extract(): the driver shape nests the line under "parsed" (or
    # only in "tail" when front-truncated).
    canaries = {}
    for label, obj in (("new", new_obj), ("old", old_obj)):
        ld, warn, canary = load_info(obj)
        if ld:
            print(f"load avg ({label}, [start, end]): {ld}")
        if canary:
            canaries[label] = canary
        # r17 (VERDICT r16 item 4): the artifact self-flags a hot start —
        # per-query flags from an annotated take are contention evidence,
        # not regression evidence; re-take before adjudicating
        if warn:
            print(f"LOAD-CONTAMINATED TAKE ({label}): {warn} — "
                  "do not adjudicate flags from this artifact")
    # r17: when both artifacts carry the fixed-workload canary, their
    # ratio IS the machine-state delta — the post-80g residue class
    # that 1-min load cannot see (BENCH_NOTES r17). A canary ratio
    # comparable to the flagged queries' ratios means machine, not code.
    if "new" in canaries and "old" in canaries and canaries["old"] > 0:
        r = canaries["new"] / canaries["old"]
        note = " — uniform query inflation at this ratio is MACHINE STATE, not code" \
            if fails and r >= 1.15 else ""
        print(f"machine canary: {canaries['old']:.2f}s -> {canaries['new']:.2f}s "
              f"({r:.2f}x){note}")
    cmd = rerun_cmd(fails)
    if cmd:
        print(f"adjudicate flagged regressions (re-measure subset, idle machine):\n  {cmd}")
    if not fails:
        print("bench gate PASS")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
