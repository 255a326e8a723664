#!/usr/bin/env python3
"""Compare two BENCH_r{N}.json files with noise-aware flagging.

Usage:
    python3 tools/bench_diff.py BENCH_r07.json BENCH_r08.json [ratio]

Per query present in both: old, new, ratio. Queries are flagged only
when the ratio clears the noise threshold (default 3.0 — this machine
swings 2–4× run-to-run on shuffle-heavy band joins; see SCALE.md), so
the report surfaces genuine regressions instead of jitter. Entries
only in one file are listed as added/removed. Exit code 1 when any
flagged regression exists (CI-friendly).
"""
import json
import os
import re
import sys


def load(path: str) -> dict:
    """Accept either the raw Bench JSON line or the driver's BENCH_r{N}
    wrapper, whose `tail` field embeds the line in captured stdout.
    Rounds ≥9 emit per-query durations as centisecond ints declared by
    "qunit":"cs" — convert back to seconds here so the rest of the
    script (and the caller) always sees seconds.

    If a sibling `<stem>_isolated.json` exists (an adjudicated
    idle-machine re-run of a contaminated round, e.g.
    BENCH_r09_isolated.json), its query values OVERLAY the round's —
    preferring the numbers a human verified over the contended ones."""
    with open(path) as f:
        text = f.read()
    d = json.loads(text)
    if "queries" not in d and "tail" in d:
        tail = d["tail"]
        d = json.loads(tail[tail.rindex('{"metric"'):].splitlines()[0])
    # Rounds ≥11 self-adjudicate: a query flagged >3x the previous round
    # mid-run is re-run alone after a gc+quiesce and ships BOTH numbers
    # as a 2-array [suite_median, quiet_rerun]. The quiet re-run is the
    # value to compare; note how many arrived adjudicated.
    adjudicated = [k for k, v in d["queries"].items() if isinstance(v, list)]
    if adjudicated:
        print(f"note: {path} carries {len(adjudicated)} self-adjudicated "
              f"entries (suite median replaced by quiet re-run): "
              f"{', '.join(sorted(adjudicated))}")
        d["queries"] = {k: (v[-1] if isinstance(v, list) else v)
                        for k, v in d["queries"].items()}
    # Rounds 9-11 emit centiseconds; rounds >=12 emit deciseconds on
    # stdout (with sub-"qmin" entries elided from the line — the
    # BENCH_DETAIL.json sidecar keeps every entry at cs precision, so
    # prefer diffing that when both sides have one).
    if d.get("qunit") == "cs":
        d["queries"] = {k: v / 100.0 for k, v in d["queries"].items()}
    elif d.get("qunit") == "ds":
        d["queries"] = {k: v / 10.0 for k, v in d["queries"].items()}
    if d.get("qmin") is not None and d.get("nq"):
        elided = d["nq"] - sum(1 for k in d["queries"] if k[0].isdigit())
        if elided > 0:
            print(f"note: {path} elides {elided} sub-floor entries "
                  f"(< {d['qmin']/10.0:.1f} s) from the stdout line; "
                  f"full detail in its round's BENCH_DETAIL.json")
    iso_path = re.sub(r"\.json$", "_isolated.json", path)
    if iso_path != path and os.path.exists(iso_path):
        with open(iso_path) as f:
            iso = json.load(f)
        overlay = {norm(k): v for k, v in iso.get("queries", {}).items()}
        d["queries"] = {
            k: overlay.get(norm(k), v) for k, v in d["queries"].items()
        }
        print(f"note: {path} overlaid with {len(overlay)} adjudicated "
              f"isolated re-run values from {iso_path}")
    return d


def contamination_banner(path: str, d: dict) -> None:
    """Rounds ≥10 carry a load sentinel: "la":[pre,post] centi-units and
    "nc" cores. In rounds 10-11 la[0] was the 1-min system load average
    sampled at start — which decays so slowly that the harness's own
    just-finished sbt compile kept it at ~3.9 on an otherwise-idle
    machine, firing this banner in r9, r10 AND r11 (a banner that always
    fires trains readers to ignore it). Rounds ≥12 (qunit "ds") report
    MEASURED FOREIGN CPU instead: (system cpu − bench JVM cpu) medianed
    over ~1.2 s, in cores — ~0 after our own compile, ≈N when a genuine
    N-core competitor runs. la[1] stays the 1-min load average at the
    END of the run (context only; it folds in our own local[N] work).
    Threshold unchanged: >1.0 competing cores flags the round so nobody
    adjudicates phantom regressions by hand (r9 cost a full cycle)."""
    la, nc = d.get("la"), d.get("nc")
    if not la or not nc or la[0] < 0:
        return
    # Rounds ≥13 declare the sentinel kind explicitly ("lak": "fcpu" =
    # measured foreign cores, "la1m" = load-average fallback — Bench's
    # com.sun bean can be unavailable/unprimed even on a ds-format
    # round, and mislabeling that fallback "foreign cpu" re-creates the
    # false-positive banner). Older artifacts fall back to the qunit
    # sniff (ds rounds all used fcpu in practice).
    lak = d.get("lak")
    foreign = lak == "fcpu" if lak else d.get("qunit") == "ds"
    if la[0] / 100.0 > 1.0:
        kind = "foreign cpu" if foreign else "load"
        caveat = ("" if foreign else
                  " [1-min load average — folds in recently-exited "
                  "processes (e.g. the harness's own compile); weaker "
                  "evidence than a measured-foreign-cpu sentinel]")
        print(f"*** CONTAMINATED: {path} started at {kind} "
              f"{la[0] / 100.0:.1f} on {nc} cores (ended at load "
              f"{la[1] / 100.0:.1f}) — timings unreliable; prefer the "
              f"[_,quiet] adjudicated values or re-run isolated before "
              f"acting ***{caveat}")


# Round ≥9 fixed short codes for the non-query bench entries
# (xss/xcp added in round 10).
X_CODES = {"xt": "x_transform", "xip": "x_incr_probe",
           "xss": "x_sigstore_lsh", "xcp": "x_containment_probe",
           "xmp": "x_media_probe", "xmd": "x_media_decon",
           "xts": "x_tokstore_bakeoff",
           "xws": "x_winnowstore_probe", "xsp": "x_arm_picker",
           "xdc": "x_deconstore_probe", "xda": "x_decon_arm",
           "xvg": "x_videoseg_store",
           "xvs": "x_vectorstore_probe", "xpq": "x_pqstore_topk",
           "xsk": "x_scaled_index_probe",
           "xpk": "x_pqstore_scaled", "xsd": "x_semdecon_gate",
           "xvd": "x_verdict_serve",
           "xprt": "x_pagerank_tol"}

# Normalized long name -> the short code Bench's SPARK_GRAFT_ONLY
# matches on (extraOn tests code.contains(entry), so the anchor-run
# command must emit SHORT codes or flagged x-entries silently never
# re-run — review r16 finding 4).
X_SHORT = {v: k for k, v in X_CODES.items()}


def norm(k: str) -> str:
    """Rounds ≤6 used full query names, rounds 7-8 the qNN short form
    (q15a/q15d disambiguated), rounds ≥9 the bare unpadded number
    ("25", "15a") plus xt/xip/xprt codes; transform-row counts also
    changed units. Normalize all to the unpadded qNN form ("q01" and
    "1" both → "q1") so cross-round diffs line up."""
    if k in X_CODES:
        return X_CODES[k]
    if k.startswith("x_transform"):
        return "x_transform"
    if k and k[0].isdigit():  # round ≥9 bare-number form
        k = "q" + k
    p = k.split("_")
    if p[0] == "q15" and len(p) > 1:
        return "q15" + p[1][0]
    m = re.match(r"^q(\d+)([a-z]?)$", p[0])
    if m:
        return "q" + str(int(m.group(1))) + m.group(2)
    return k


def drift_of(qo: dict, qn: dict) -> float:
    """Calibration-anchor ratio (VERDICT r13 what's-wrong 1): the two
    artifacts come from different days on a machine whose absolute
    speed drifts (SCALE.md measured the UNCHANGED sf10 recompute arm
    1.4x slower across rounds) — so a same-key ratio mixes machine
    state with real change. The MEDIAN ratio over every comparable
    shared entry estimates the machine-state component (a real
    regression moves one entry, not the median), and flags use the
    drift-CORRECTED ratio. Needs >=8 comparable entries (>=0.5 s both
    sides) to be meaningful; returns 1.0 otherwise.

    Blind spot, by design: a code change that slowed EVERY query by the
    same factor would be read as machine drift. The headline total (and
    the suite-wide 2x envelope the judge applies to it) still catches
    that case — the correction only governs per-query flags.

    The correction is deliberately SYMMETRIC: on a uniformly FASTER day
    (drift < 1) an entry that did NOT share the fleet-wide speedup gets
    rc = r/drift > r and can flag at extreme drift (< 1/threshold, i.e.
    the machine ran 3x faster overall at the default threshold). That
    is intentional — a query pinned at its old time while every sibling
    sped up 3x is exactly the stuck-on-one-core / driver-serialized
    anomaly worth reproducing isolated; the flag text already demands
    isolated reproduction before treating it as real. The r14 tokenizer
    cluster is the inverse lesson: family-clustered movement against a
    faster median is a calibration question, answered by a same-JVM
    anchor run (SCALE.md r15), never by this tool alone."""
    ratios = sorted(qn[k] / qo[k] for k in set(qo) & set(qn)
                    if qo[k] >= 0.5 and qn[k] >= 0.5)
    if len(ratios) < 8:
        return 1.0
    mid = len(ratios) // 2
    return (ratios[mid] if len(ratios) % 2
            else (ratios[mid - 1] + ratios[mid]) / 2)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    contamination_banner(sys.argv[1], old)
    contamination_banner(sys.argv[2], new)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    qo = {norm(k): v for k, v in old["queries"].items()}
    qn = {norm(k): v for k, v in new["queries"].items()}
    drift = drift_of(qo, qn)
    if drift != 1.0:
        print(f"calibration: median same-key ratio {drift:.2f} taken as "
              f"machine drift; flags use ratio/{drift:.2f}")
    flagged = []
    print(f"{'query':24s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for k in sorted(set(qo) & set(qn)):
        a, b = qo[k], qn[k]
        if a <= 0 or b <= 0:  # negative = failed run, 0 = not measured
            marker = "FAIL" if min(a, b) < 0 else "SKIP"
            print(f"{k:24s} {a:8.2f} {b:8.2f}    {marker}")
            continue
        r = b / a
        rc = r / drift  # drift-corrected: machine state divided out
        mark = ""
        if rc >= threshold and b >= 1.0:  # sub-second noise never flags
            mark = " <-- REGRESSION"
            flagged.append((k, a, b, r))
        elif rc <= 1 / threshold and a >= 1.0:
            mark = " (improved)"
        print(f"{k:24s} {a:8.2f} {b:8.2f} {r:7.2f}{mark}")
    # A key missing from a qmin-declaring (ds) artifact whose other-side
    # value sits under that floor was ELIDED from the stdout line, not
    # added/removed — label it so floor churn never reads as coverage
    # churn.
    floor_old = old.get("qmin", 0) / 10.0
    floor_new = new.get("qmin", 0) / 10.0
    for k in sorted(set(qn) - set(qo)):
        tag = "(sub-floor in old)" if floor_old and qn[k] < floor_old else "added"
        print(f"{k:24s} {'-':>8s} {qn[k]:8.2f}   {tag}")
    for k in sorted(set(qo) - set(qn)):
        tag = "(sub-floor in new)" if floor_new and qo[k] < floor_new else "removed"
        print(f"{k:24s} {qo[k]:8.2f} {'-':>8s}   {tag}")
    print(f"\ntotal: {old.get('value', '?')} -> {new.get('value', '?')} s"
          f"  ({len(qo)} -> {len(qn)} entries, threshold {threshold}x)")
    if flagged:
        print(f"{len(flagged)} flagged — reproduce each ISOLATED "
              f"(SPARK_GRAFT_ONLY=<name>) before treating as real:")
        for k, a, b, r in flagged:
            print(f"  {k}: {a:.2f} -> {b:.2f} ({r:.1f}x)")
        anchor_cmd(flagged, drift)
    return 1 if flagged else 0


ANCHORS = ("q42", "q117")


def anchor_cmd(flagged, drift: float) -> None:
    """Mechanize the same-JVM anchor protocol (VERDICT r15 next-5 —
    previously prose + one worked example in SCALE.md, relied on the
    operator remembering it). Trigger: flags that moved by a SHARED
    factor (family-clustered movement, the r14 tokenizer case: raw
    ratios within 1.5x of each other across >=2 flags), a broad flag
    set (>=3), or pronounced calibration drift — all three are
    machine-state signatures the per-entry correction cannot
    adjudicate alone. Emit the one command that can: run the SCALE.md
    anchors (structurally UNCHANGED queries) in the SAME JVM as the
    flagged keys; if the anchors moved by the same factor, the flags
    are machine state, else real, net of the anchors' movement."""
    ratios = sorted(r for _, _, _, r in flagged)
    clustered = len(ratios) >= 2 and ratios[-1] / ratios[0] <= 1.5
    if not (clustered or len(ratios) >= 3 or drift >= 1.25 or drift <= 0.8):
        return
    keys = ",".join(list(ANCHORS) +
                    sorted(X_SHORT.get(k, k) for k, _, _, _ in flagged))
    why = ("family-clustered movement" if clustered
           else f"{len(ratios)} flags" if len(ratios) >= 3
           else f"calibration drift {drift:.2f}")
    print(f"{why}: adjudicate machine state with a same-JVM anchor run "
          f"(SCALE.md r15) before treating any of these as real —")
    print(f'  SPARK_GRAFT_ONLY="{keys}" SPARK_GRAFT_SF_DIR=<sfdir> '
          f'sbt "runMain graft.Bench"')
    print(f"  anchors {', '.join(ANCHORS)} are structurally unchanged: "
          f"if they move by the flags' factor, it is machine state")


if __name__ == "__main__":
    sys.exit(main())
