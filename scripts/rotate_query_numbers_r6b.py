"""One-shot renumbering of registry query names (round-6 SECOND
rotation, late-session).

The late-round-6 sessions added twelve out-of-window stems (r90-r101)
while the round's window rotation had already run — leaving the S14
dated-scan family and the entire new S15 corpus-routing family with NO
driver row, the exact process gap the round-5 verdict flagged (its
item 3). This swap gives driver rows THIS round to one stem per new
family plus the widened-router headliners; the remaining late stems
(r90/r91/r93/r95/r96/r101) are round-7 entrants per
docs/QUERY_ROTATION.md.

Entrants (all local-oracle green at HEAD)      Evicted (row of record)
  r92_sql_mixed_star_group  -> q20    q20_fulltext_bm25    r5 -> r102
  r94_sql_date_scan         -> q28    q28_pii_scrub        r5 -> r103
  r97_sql_triple_arm        -> q33    q33_ann_lsh          r5 -> r104
  r98_sql_arm_measures      -> q35    q35_grouped_agg_udf  r5 -> r105
  r99_sql_docs_profile      -> q40    q40_media_resize     r5 -> r106
  r100_sql_events_rollup    -> q43    q43_semantic_dedup   r5 -> r107

Eviction rule (same as every rotation): each evicted stem carries a
round-5-green driver row, and its §2 family keeps an in-window
sibling (L13: q15; L3: q29/q36/q03; U: q37/q42; L8: q30/q45; L18b:
q41) or stands on that row (L12 BM25). multimodal.py WAS touched in
round 6 (truncation guards) — q40's family deliberately keeps TWO
in-window siblings (q30/q45) for exactly that reason.

Applied once via ``python scripts/rotate_query_numbers_r6b.py``; kept
for provenance. Historical round artifacts are never rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path("/root/repo")

QSWAPS: dict[int, str] = {
    # evicted (r5-green rows of record)
    20: "r102", 28: "r103", 33: "r104", 35: "r105", 40: "r106", 43: "r107",
}
RSWAPS: dict[int, str] = {
    92: "q20", 94: "q28", 97: "q33", 98: "q35", 99: "q40", 100: "q43",
}

SKIP = {
    "VERDICT.md", "ADVICE.md", "PROGRESS.jsonl", "COPYCHECK.json",
    "LEAKCHECK.json", "BASELINE.json", "BASELINE.md", "SNIPPETS.md",
    "PAPERS.md", "TESTDATA.md", "rotate_query_numbers.py",
    "rotate_query_numbers_r3.py", "rotate_query_numbers_r4.py",
    "rotate_query_numbers_r5.py", "rotate_query_numbers_r6.py",
    "rotate_query_numbers_r6b.py", "QUERY_ROTATION.md",
}
SKIP_PREFIXES = ("CORRECTNESS_r", "BENCH_r")

# 2-3 digit prefixes: r100/r101 are 3-digit tokens; greedy match keeps
# r10_exists (2-digit, not in the table) untouched.
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
