#!/usr/bin/env python3
"""Generate the no_oracle audit table (VERDICT r18 next-6).

Each of the 31 `no_oracle` entries in the latest CORRECTNESS artifact is
individually accuracy-pinned in a spec against an exact counterpart or a
hand-computed fixture, but that honesty lived in 31 scattered spec
comments. This tool emits ONE table (entry -> pinning spec ->
pinned-against) for OPERATORS.md, and refuses to emit anything it cannot
verify:

 - every no_oracle entry in the artifact must have a row here (a new
   rows-only query without an audit row fails the build of this table);
 - every claimed spec file must exist under src/test;
 - every claimed spec must actually contain the entry's verification
   token (so a renamed/deleted pin is caught, not silently reported).

Usage: python3 tools/no_oracle_audit.py [CORRECTNESS_rN.json]
Prints the markdown table on stdout; exits non-zero on any violation.
"""
import glob
import json
import os
import re
import sys

# entry -> (spec basenames, grep token per spec, pinned-against prose).
# The token is a string that must appear in the spec file — the query id
# where the spec names it, otherwise the pinned function/fixture name.
AUDIT = {
    "q15_approx_distinct": (
        [("SketchSpec", "q15_approx"), ("SketchRollupSpec", "sketch estimate")],
        "exact countDistinct within 3x the declared rsd; HLL merge via rollup"),
    "q40_minhash_lsh_fast": (
        [("DedupSpec", "minhashLshFast")],
        "pair-set agreement with the md5-parity path q18 and the exact pair set"),
    "q55_approx_quantiles": (
        [("SketchSpec", "q55")],
        "exact percentiles (oracle-green q35) within the GK 2% rank-error bound"),
    "q76_simhash_fast": (
        [("DedupSpec", "q76")],
        "identical-token-set recall vs the md5-parity path q39"),
    "q117_bpe_merges": (
        [("BpeSpec", "driver-side reference")],
        "hand-computed low/lower merges + a driver-side reference trainer"),
    "q122_bpe_encode": (
        [("BpeSpec", "q122")],
        "hand-computed token counts + the n_words<=n_tokens<=n_chars invariant"),
    "q123_mmr_diverse": (
        [("SimilaritySpec", "q123")],
        "hand-computed greedy MMR pick order"),
    "q129_cms_freq": (
        [("CmsSpec", "q129")],
        "est>=truth, the 2n/width error bound, and merge-tree invariance"),
    "q151_substring_fast": (
        [("SubstringDedupSpec", "q151")],
        "span-set equality with the exact raw-gram path (oracle-green q149)"),
    "q153_image_neardup": (
        [("MediaDedupSpec", "q153")],
        "exact brute-force pair parity (pigeonhole-exact banding = equality)"),
    "q157_image_scrub": (
        [("MediaDedupSpec", "q157")],
        "survivor parity vs a driver union-find over the exact pair set"),
    "q158_unigram_vocab": (
        [("UnigramSpec", "q158")],
        "hand-computed Viterbi picks + double-run determinism"),
    "q159_unigram_encode": (
        [("UnigramSpec", "q159")],
        "reconstruction + in-vocab closure + compression-beats-characters"),
    "q160_unigram_sample": (
        [("UnigramSpec", "q160")],
        "sampled-encode invariants (alpha=0 degenerates to exact Viterbi q159)"),
    "q162_wordpiece_merges": (
        [("WordPieceSpec", "q162")],
        "a corpus where likelihood provably disagrees with BPE's count criterion"),
    "q163_wordpiece_encode": (
        [("WordPieceSpec", "q163")],
        "hand-computed greedy longest-match / [UNK] semantics"),
    "q166_tokenizer_compare": (
        [("TokenizerCompareSpec", "q166")],
        "every cell re-derived from the individual encode relations"),
    "q167_bytebpe_merges": (
        [("ByteBpeSpec", "q167")],
        "CJK/emoji round-trips + ASCII parity with the char trainer (q117)"),
    "q168_substring_probe_fast": (
        [("SubstringDedupSpec", "q168")],
        "span-set parity with the raw-key incremental probe (oracle-green q152)"),
    "q169_substring_auto": (
        [("SubstringDedupSpec", "q169")],
        "span-set parity with oracle-green q152 + both dispatch regimes planted"),
    "q174_decon_spans_fast": (
        [("SubstringDedupSpec", "q174")],
        "span-set parity with the raw-gram decon path (oracle-green q172)"),
    "q180_tokenizer_fertility": (
        [("TokenizerCompareSpec", "q180")],
        "per-lang cells PARTITION q166's corpus totals; premium floors at 1.0"),
    "q186_novelty_fast": (
        [("SubstringDedupSpec", "q186")],
        "curve parity with the raw-gram novelty report (oracle-green q184)"),
    "q188_ivf_scaled": (
        [("SimilaritySpec", "q188")],
        "exhaustive recall on cluster-structured data + recall floor vs brute force"),
    "q193_novelty_by_source_fast": (
        [("SubstringDedupSpec", "q193")],
        "curve parity with the per-source raw-gram report (oracle-green q192)"),
    "q195_ivfpq_scaled": (
        [("SimilaritySpec", "q195"), ("VectorIndexStoreSpec", "q195")],
        "exact top-5 on clusters + recall floor vs brute force; store face byte-parity"),
    "q197_media_decon": (
        [("MediaDedupSpec", "q197")],
        "parity with q153's pairs restricted cross-split + planted verbatim re-crawl"),
    "q198_three_eye_decon": (
        [("ThreeEyeDeconSpec", "q198")],
        "gram+semantic half column-for-column vs ORACLE-GREEN q196; media vs q197 rollup"),
    "q199_media_coverage": (
        [("ThreeEyeDeconSpec", "q199")],
        "exactly q197's pair relation rolled up per eval doc (zero rows when clean)"),
    "q200_media_scrub": (
        [("ThreeEyeDeconSpec", "q200")],
        "survivors = train minus q197's flagged docs; imageless-keep absence rule"),
    "q201_eye_overlap": (
        [("ThreeEyeDeconSpec", "q201")],
        "cell-for-cell vs q198's relation rolled up in memory, all 8 combinations"),
}


def main():
    art = sys.argv[1] if len(sys.argv) > 1 else sorted(
        glob.glob("CORRECTNESS_r*.json"),
        key=lambda f: int(re.search(r"\d+", f).group()))[-1]
    with open(art) as f:
        entries = json.load(f)
    no_oracle = sorted(k for k, v in entries.items() if v.get("err") == "no_oracle")

    missing = [k for k in no_oracle if k not in AUDIT]
    stale = [k for k in AUDIT if k not in no_oracle]
    if missing:
        sys.exit(f"FAIL: no audit row for no_oracle entries {missing} in {art}")
    if stale:
        sys.exit(f"FAIL: audit rows {stale} are not no_oracle in {art}")

    specs = {os.path.basename(p)[:-6]: p
             for p in glob.glob("src/test/**/*.scala", recursive=True)}
    rows = []
    for k in no_oracle:
        spec_list, against = AUDIT[k]
        names = []
        for spec, token in spec_list:
            path = specs.get(spec)
            if not path:
                sys.exit(f"FAIL: {k}: pinning spec {spec} not found under src/test")
            with open(path) as f:
                if token not in f.read():
                    sys.exit(f"FAIL: {k}: {spec} does not mention '{token}'")
            names.append(f"`{spec}`")
        rows.append(f"| {k} | {', '.join(names)} | {against} |")

    print(f"<!-- generated by tools/no_oracle_audit.py from {art}; "
          "every spec name grep-verified -->")
    print(f"| `no_oracle` entry ({len(rows)}) | pinning spec | pinned against |")
    print("|---|---|---|")
    print("\n".join(rows))


if __name__ == "__main__":
    main()
