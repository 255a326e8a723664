#!/usr/bin/env python3
"""Fixture tests for bench_diff.py — run directly:

    python3 tools/test_bench_diff.py      # prints OK per case, exits 0

Covers the round-12 sentinel change (la[0] = measured foreign cpu, not
the slow-decaying 1-min load average): an idle-machine r12 artifact
must NOT trip the contamination banner even right after the harness's
own compile, while a synthetic competing load still must. Also pins the
ds-unit conversion, the qmin sub-floor labeling, and the cs wrapper
path that rounds 9-11 emit.
"""
import io
import json
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_diff  # noqa: E402


def capture(fn, *args):
    buf = io.StringIO()
    with redirect_stdout(buf):
        out = fn(*args)
    return out, buf.getvalue()


def write_tmp(d):
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(d, f)
    f.close()
    return f.name


def main() -> int:
    # --- contamination banner: idle r12 artifact (foreign cpu 0.1) is clean
    idle = {"qunit": "ds", "queries": {"1": 3}, "la": [10, 2716], "nc": 32}
    _, out = capture(bench_diff.contamination_banner, "idle.json", idle)
    assert "CONTAMINATED" not in out, out
    print("OK idle r12 artifact carries no banner")

    # --- a synthetic competing load (2.5 foreign cores) still trips it
    loaded = {"qunit": "ds", "queries": {"1": 3}, "la": [250, 2716], "nc": 32}
    _, out = capture(bench_diff.contamination_banner, "loaded.json", loaded)
    assert "CONTAMINATED" in out and "foreign cpu 2.5" in out, out
    print("OK synthetic competing load trips the banner")

    # --- r10/r11-era artifact (cs, load-average semantics) still flags
    legacy = {"qunit": "cs", "queries": {"1": 30}, "la": [388, 1401], "nc": 32}
    _, out = capture(bench_diff.contamination_banner, "r11.json", legacy)
    assert "CONTAMINATED" in out and "load 3.9" in out, out
    print("OK legacy load-average artifact still flags")

    # --- r13+: explicit "lak" kind beats the qunit sniff — a ds-format
    # round whose com.sun bean never primed falls back to the 1-min
    # load average and must banner as ambiguous "load", never as
    # measured "foreign cpu" (ADVICE r12).
    fallback = {"qunit": "ds", "queries": {"1": 3}, "lak": "la1m",
                "la": [390, 2716], "nc": 32}
    _, out = capture(bench_diff.contamination_banner, "fb.json", fallback)
    assert "load 3.9" in out and "foreign cpu" not in out, out
    assert "weaker evidence" in out, out
    print("OK lak:la1m fallback banners as ambiguous load, not foreign cpu")

    # --- and lak:"fcpu" still banners as foreign cpu with no caveat
    fcpu = {"qunit": "ds", "queries": {"1": 3}, "lak": "fcpu",
            "la": [250, 2716], "nc": 32}
    _, out = capture(bench_diff.contamination_banner, "fc.json", fcpu)
    assert "foreign cpu 2.5" in out and "weaker evidence" not in out, out
    print("OK lak:fcpu banners as measured foreign cpu")

    # --- ds unit conversion + qmin elision note on load()
    ds_art = {"metric": "total", "qunit": "ds", "qmin": 2, "nq": 4,
              "queries": {"1": 3, "2": 41, "xprt": 541}}
    path = write_tmp(ds_art)
    d, out = capture(bench_diff.load, path)
    assert d["queries"]["1"] == 0.3 and d["queries"]["2"] == 4.1, d["queries"]
    assert "elides 2 sub-floor entries" in out, out
    os.unlink(path)
    print("OK ds conversion and qmin elision note")

    # --- cs driver wrapper (tail-embedded line) converts to seconds
    tail = ('some stdout noise\n{"metric":"total","value":1.0,"unit":"sec",'
            '"qunit":"cs","queries":{"3":41,"111":[482,55]},"sf":"sf0.1"}\n')
    path = write_tmp({"tail": tail, "parsed": None})
    d, out = capture(bench_diff.load, path)
    assert d["queries"]["3"] == 0.41, d["queries"]
    assert d["queries"]["111"] == 0.55, d["queries"]  # quiet re-run wins
    os.unlink(path)
    print("OK cs wrapper parses; adjudication array resolves to quiet value")

    # --- sub-floor keys missing from a ds artifact label as elided
    old = write_tmp({"qunit": "cs",
                     "queries": {"1": 30, "2": 10, "90": 500}})
    new = write_tmp({"qunit": "ds", "qmin": 2, "nq": 3,
                     "queries": {"1": 3, "90": 50}})
    argv, sys.argv = sys.argv, ["bench_diff.py", old, new]
    try:
        code, out = capture(bench_diff.main)
    finally:
        sys.argv = argv
    assert code == 0, out
    assert "(sub-floor in new)" in out and "removed" not in out, out
    os.unlink(old)
    os.unlink(new)
    print("OK sub-floor elision labels instead of removed")

    # --- calibration anchor: a uniform 1.4x machine-drift slowdown
    # across >=8 comparable entries must NOT flag anything (the median
    # ratio IS the drift), while a single genuine 5x regression on top
    # of that drift still must.
    base = {str(i): 100 for i in range(1, 10)}          # 1.00 s each (cs)
    drifted = {str(i): 140 for i in range(1, 10)}       # uniform 1.4x
    old = write_tmp({"qunit": "cs", "queries": dict(base)})
    new = write_tmp({"qunit": "cs", "queries": dict(drifted)})
    argv, sys.argv = sys.argv, ["bench_diff.py", old, new, "1.3"]
    try:
        code, out = capture(bench_diff.main)
    finally:
        sys.argv = argv
    assert code == 0, out  # 1.4x raw > 1.3x threshold, but drift-corrected = 1.0
    assert "median same-key ratio 1.40" in out, out
    os.unlink(old)
    os.unlink(new)
    print("OK uniform machine drift does not flag")

    regressed = dict(drifted)
    regressed["5"] = 500                                # 5x raw, 3.6x corrected
    old = write_tmp({"qunit": "cs", "queries": dict(base)})
    new = write_tmp({"qunit": "cs", "queries": regressed})
    argv, sys.argv = sys.argv, ["bench_diff.py", old, new]
    try:
        code, out = capture(bench_diff.main)
    finally:
        sys.argv = argv
    assert code == 1, out
    assert "q5: 1.00 -> 5.00" in out, out
    os.unlink(old)
    os.unlink(new)
    print("OK real regression flags through the drift correction")

    # --- too few comparable entries: no calibration (drift stays 1.0)
    old = write_tmp({"qunit": "cs", "queries": {"1": 100, "2": 100}})
    new = write_tmp({"qunit": "cs", "queries": {"1": 400, "2": 100}})
    argv, sys.argv = sys.argv, ["bench_diff.py", old, new]
    try:
        code, out = capture(bench_diff.main)
    finally:
        sys.argv = argv
    assert code == 1 and "calibration" not in out, out
    os.unlink(old)
    os.unlink(new)
    print("OK sparse artifacts skip calibration and still flag raw")

    # --- anchors mode (VERDICT r15 next-5): the r14 tokenizer case —
    # a FAMILY of entries moving by a shared ~3.5x factor against a
    # flat median is a calibration question, and the tool must emit
    # the same-JVM anchor-run command, not bare flags.
    base = {str(i): 100 for i in range(1, 10)}
    base.update({"160": 200, "165": 300, "166": 400})
    fam = dict(base)
    fam.update({"160": 700, "165": 1000, "166": 1400})  # ~3.5x, clustered
    old = write_tmp({"qunit": "cs", "queries": base})
    new = write_tmp({"qunit": "cs", "queries": fam})
    argv, sys.argv = sys.argv, ["bench_diff.py", old, new]
    try:
        code, out = capture(bench_diff.main)
    finally:
        sys.argv = argv
    assert code == 1, out
    assert "family-clustered movement" in out, out
    assert 'SPARK_GRAFT_ONLY="q42,q117,q160,q165,q166"' in out, out
    os.unlink(old)
    os.unlink(new)
    print("OK family-clustered flags emit the same-JVM anchor command")

    # --- a single lone regression (no cluster, low drift) stays a
    # plain flag: the anchor protocol is for calibration questions,
    # not every regression.
    lone = dict(base)
    lone["5"] = 500
    old = write_tmp({"qunit": "cs", "queries": base})
    new = write_tmp({"qunit": "cs", "queries": lone})
    argv, sys.argv = sys.argv, ["bench_diff.py", old, new]
    try:
        code, out = capture(bench_diff.main)
    finally:
        sys.argv = argv
    assert code == 1 and "SPARK_GRAFT_ONLY=\"q42" not in out, out
    os.unlink(old)
    os.unlink(new)
    print("OK a lone regression flags without the anchor ceremony")

    # --- flagged x-entries come back as SHORT codes in the anchor
    # command: SPARK_GRAFT_ONLY matches Bench's short codes, so the
    # normalized long form would silently never re-run the entry.
    xbase = {str(i): 100 for i in range(1, 10)}
    xbase.update({"xsd": 150, "160": 100})
    xfam = dict(xbase)
    xfam.update({"xsd": 600, "160": 380})       # 4.0x and 3.8x, clustered
    old = write_tmp({"qunit": "cs", "queries": xbase})
    new = write_tmp({"qunit": "cs", "queries": xfam})
    argv, sys.argv = sys.argv, ["bench_diff.py", old, new]
    try:
        code, out = capture(bench_diff.main)
    finally:
        sys.argv = argv
    assert code == 1, out
    cmd_line = [l for l in out.splitlines() if 'SPARK_GRAFT_ONLY="' in l]
    assert cmd_line and 'SPARK_GRAFT_ONLY="q42,q117,q160,xsd"' in cmd_line[0], out
    assert "x_semdecon_gate" not in cmd_line[0], out
    os.unlink(old)
    os.unlink(new)
    print("OK flagged x-entries emit their SHORT codes in the anchor command")

    print("PASS: all bench_diff fixtures")
    return 0


if __name__ == "__main__":
    sys.exit(main())
