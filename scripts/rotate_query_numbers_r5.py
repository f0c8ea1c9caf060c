"""One-shot renumbering of registry query names (round-5 rotation).

The round-4 verdict's item 2: the q51+/r* stems were last
driver-verified in rounds 1-2 under old numbering, and round 4's
38-finding review sweep churned their implementations (pipeline, udx,
analytics, streaming twins, sinks); rotate >=20 of them back into the
driver's 50-query window for fresh hard rows. Round 5 additionally
rewrote the media queries onto genuine container bytes (q74 needs a
first post-rewrite row) and added the pricing aggregate-projection
query (r36, new). 26 swaps; every evicted query carries a fresh
round-4-green row of record (CORRECTNESS_r04.json) and its §2 row
either keeps an in-window sibling or stands on that record (see
docs/QUERY_ROTATION.md round-5 table).

Entrants (last hard row -> new window slot):
  q81_tweet_pipeline   r2 -> q02   q91_json_scan        r2 -> q13
  q82_gap_fill         r2 -> q03   q92_csv_scan         r2 -> q14
  q83_cohort_retention r2 -> q04   q93_partitioned_sink r2 -> q16
  q84_funnel_conversion r2 -> q05  q94_query_index      r2 -> q17
  q85_scd2_intervals   r2 -> q06   q95_fulltext_bm25    r2 -> q20
  q86_tumbling_window  r2 -> q07   q96_null_clean       r2 -> q21
  q87_sliding_window   r2 -> q08   q97_fuzzy_pairs      r2 -> q22
  q88_session_window   r2 -> q09   q98_upsert_merge     r2 -> q23
  q89_stream_static_join r2 -> q10 q99_corpus_pipeline  r2 -> q25
  q90_stream_stream_join r2 -> q12 q76_pandas_scalar_udf r2 -> q31
  q77_grouped_map_udf  r2 -> q34   q78_grouped_agg_udf  r2 -> q35
  q79_scalar_udf       r2 -> q37   q80_udtf             r2 -> q42
  q74_media_meta_extract rewritten r5 -> q45
  r36_bucketed_pricing new r5 -> q46

Applied once via ``python scripts/rotate_query_numbers_r5.py``; kept
for provenance. Historical round artifacts are never rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path("/root/repo")

# bare-token bijection over the two-digit prefix (descriptive suffixes
# travel with the token): old (prefix, NN) -> new token
QSWAPS: dict[int, str] = {
    # entrants
    81: "q02", 82: "q03", 83: "q04", 84: "q05", 85: "q06",
    86: "q07", 87: "q08", 88: "q09", 89: "q10", 90: "q12",
    91: "q13", 92: "q14", 93: "q16", 94: "q17", 95: "q20",
    96: "q21", 97: "q22", 98: "q23", 99: "q25", 76: "q31",
    77: "q34", 78: "q35", 79: "q37", 80: "q42", 74: "q45",
    # evicted (r4-green rows of record)
    2: "r37", 3: "r38", 4: "r39", 5: "r40", 6: "r41",
    7: "r42", 8: "r43", 9: "r44", 10: "r45", 12: "r46",
    13: "r47", 14: "r48", 16: "r49", 17: "r50", 20: "r51",
    21: "r52", 22: "r53", 23: "r54", 25: "r55", 31: "r56",
    34: "r57", 35: "r58", 37: "r59", 42: "r60", 45: "r61",
    46: "r62",
}
RSWAPS: dict[int, str] = {36: "q46"}

SKIP = {
    "VERDICT.md", "ADVICE.md", "PROGRESS.jsonl", "COPYCHECK.json",
    "LEAKCHECK.json", "BASELINE.json", "BASELINE.md", "SNIPPETS.md",
    "PAPERS.md", "TESTDATA.md", "rotate_query_numbers.py",
    "rotate_query_numbers_r3.py", "rotate_query_numbers_r4.py",
    "rotate_query_numbers_r5.py", "QUERY_ROTATION.md",
}
SKIP_PREFIXES = ("CORRECTNESS_r", "BENCH_r")

TOKEN = re.compile(r"\b([qr])(\d{2})(?=\b|_)")


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
