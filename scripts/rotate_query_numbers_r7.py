"""One-shot renumbering of registry query names (round-7 rotation).

Round 6 left the largest-ever out-of-window tail (VERDICT round 6,
item 1), and round 7 added six more stems (the sources dim arm, the
clustered documents layout, user projections v2, the segment cube's
rebuilt r93). This rotation gives driver rows to the ENTIRE named
tail — every round-6/7 stem with only a local oracle row — plus two
of the r6b churn evictees; the other four churn stems (r103 pii_scrub,
r104 ann_lsh, r106 media_resize, r107 semantic_dedup) stay
registry-gated with strong in-window family siblings (q41, q45, q27,
q15), per the registry-vs-window policy paragraph in
docs/QUERY_ROTATION.md.

Entrants (all local-oracle green at HEAD)        Evicted (row of record)
  r90_sql_chain_segment       -> q04    q04_zorder_query       r6 -> r116
  r91_sql_distinct_keys       -> q09    q09_vocab_build        r6 -> r117
  r93_sql_segment_group       -> q10    q10_encode_ids         r6 -> r118
  r95_sql_count_distinct      -> q11    q11_incremental_dedup  r6 -> r119
  r96_sql_part_revenue        -> q14    q14_bigram_lm          r6 -> r120
  r101_sql_events_scan        -> q16    q16_bpe_token_counts   r6 -> r121
  r108_user_projection_sql    -> q20    q20_sql_mixed_star_group r6 -> r122
  r109_events_distinct_users  -> q21    q21_kmeans_embeddings  r6 -> r123
  r110_star_distinct_suppliers-> q22    q22_fuzzy_pairs        r6 -> r124
  r111_sql_stopword_profile   -> q23    q23_tfidf              r6 -> r125
  r112_sql_sources_dim_cube   -> q24    q24_chunk_dedup        r6 -> r126
  r113_sql_sources_dim_raw    -> q30    q30_frame_sample       r6 -> r127
  r114_sql_docs_scan          -> q36    q36_ann_ivf            r6 -> r128
  r115_user_arm_projection_sql-> q34    q34_binary_ops         r6 -> r129
  r102_fulltext_bm25 (churn)  -> q48    q48_decontamination    r6 -> r130
  r105_grouped_agg_udf (churn)-> q49    q49_sql_pricing        r6 -> r131

Eviction rule (same as every rotation): each evicted stem carries a
round-6-green driver row, and its §2 family keeps an in-window
sibling — S12: q28 + the entering docs-scan layout row; L19: q08;
L17/L1/L2: q18/q27; L22/L5: q12/q19; S13: q05/q06/q07 + five
entering SQL rows; C1/L3: q29/q03; dedup: q18/q27; L24: q18/q27;
L8: q45 (multimodal untouched in r7, ONE sibling suffices this time);
L16: q32; E1b: the five entering SQL rows. q31 (F-S) stays in-window
— the scalar-function family has no other in-window sibling. Code touched in round 7 (dated.py,
routing arms, corpus routing) deliberately KEEPS its rows in-window:
q28 (dated pruning fix), q33/q35 (arm plans), q40/q43 (corpus cubes),
q05/q06/q07 (raw-fallback maintained-relation change).

NOTE: r93's suffix was renamed sql_spine_group -> sql_segment_group
BEFORE this rotation (the statement now routes onto the round-7
segment cube, not the spine); historical round-6 tables keep the old
suffix they measured.

Applied once via ``python scripts/rotate_query_numbers_r7.py``; kept
for provenance. Historical round artifacts are never rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path("/root/repo")

QSWAPS: dict[int, str] = {
    # evicted (r6-green rows of record)
    4: "r116", 9: "r117", 10: "r118", 11: "r119", 14: "r120",
    16: "r121", 20: "r122", 21: "r123", 22: "r124", 23: "r125",
    24: "r126", 30: "r127", 36: "r128", 34: "r129", 48: "r130",
    49: "r131",
}
RSWAPS: dict[int, str] = {
    90: "q04", 91: "q09", 93: "q10", 95: "q11", 96: "q14",
    101: "q16", 108: "q20", 109: "q21", 110: "q22", 111: "q23",
    112: "q24", 113: "q30", 114: "q36", 115: "q34", 102: "q48",
    105: "q49",
}

SKIP = {
    "VERDICT.md", "ADVICE.md", "PROGRESS.jsonl", "COPYCHECK.json",
    "LEAKCHECK.json", "BASELINE.json", "BASELINE.md", "SNIPPETS.md",
    "PAPERS.md", "TESTDATA.md", "rotate_query_numbers.py",
    "rotate_query_numbers_r3.py", "rotate_query_numbers_r4.py",
    "rotate_query_numbers_r5.py", "rotate_query_numbers_r6.py",
    "rotate_query_numbers_r6b.py", "rotate_query_numbers_r7.py",
    "QUERY_ROTATION.md",
}
SKIP_PREFIXES = ("CORRECTNESS_r", "BENCH_r")

# 2-3 digit prefixes, single simultaneous pass: q04's new name r116
# can never be re-matched because each token is rewritten exactly
# once. Greedy \d{2,3} keeps r10_exists (not in the table) untouched.
TOKEN = re.compile(r"\b([qr])(\d{2,3})(?=\b|_)")


def rewrite(text: str) -> str:
    def sub(m: re.Match) -> str:
        prefix, num = m.group(1), int(m.group(2))
        table = QSWAPS if prefix == "q" else RSWAPS
        return table.get(num, m.group(0))

    return TOKEN.sub(sub, text)


def main() -> None:
    changed = []
    for path in sorted(REPO.rglob("*")):
        if path.suffix not in {".py", ".md"} or not path.is_file():
            continue
        if path.name in SKIP or ".git" in path.parts or "spark-warehouse" in path.parts:
            continue
        if path.name.startswith(SKIP_PREFIXES):
            continue
        old = path.read_text()
        new = rewrite(old)
        if new != old:
            path.write_text(new)
            changed.append(str(path.relative_to(REPO)))
    print("rewrote:", *changed, sep="\n  ")


if __name__ == "__main__":
    main()
