"""One-shot renumbering of registry query names (round-4 rotation).

Round 3 closed the inventory with a 50/50 driver window; the round-3
verdict's item 5 asks that the queries whose IMPLEMENTATIONS were
tuned in round 3 (exact-dedup fingerprint path, minhash map-only
signatures, cosine Arrow kernel) and their ANN recall companions
rotate back into the q01-q50 window so their post-tuning form gets a
hard CORRECTNESS row at HEAD — plus window slots for the two NEW
round-4 queries (bucketed star join, IVF-routed full-corpus semantic
dedup). Seven swaps; the seven evicted queries all carry fresh
round-3-green rows of record and keep an in-window sibling for their
§2 row (see docs/QUERY_ROTATION.md round-4 table).

  q63_exact_dedup        -> q18_exact_dedup   (q18_hashtag_counts  -> r29)
  q65_minhash_lsh        -> q27_minhash_lsh   (q27_left_outer_join -> r30)
  q68_cosine_topk        -> q29_cosine_topk   (q29_semi_join       -> r31)
  q70_ann_lsh            -> q33_ann_lsh       (q33_range_join      -> r32)
  q72_ann_ivf            -> q36_ann_ivf       (q36_rank_functions  -> r33)
  z01_bucketed_star_join -> q39_bucketed_star_join (q39_range_frame -> r34)
  z02_semantic_dedup_ivf -> q41_semantic_dedup_ivf (q41_union_all   -> r35)

Applied once via ``python scripts/rotate_query_numbers_r4.py``; kept
for provenance. Historical round artifacts are never rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path("/root/repo")

# bare-token bijection: old (q, NN) -> new (prefix, NN)
SWAPS: dict[int, str] = {
    63: "q18",
    65: "q27",
    68: "q29",
    70: "q33",
    72: "q36",
    18: "r29",
    27: "r30",
    29: "r31",
    33: "r32",
    36: "r33",
    39: "r34",
    41: "r35",
}
ZSWAPS = {"z01": "q39", "z02": "q41"}

SKIP = {
    "VERDICT.md", "ADVICE.md", "PROGRESS.jsonl", "COPYCHECK.json",
    "LEAKCHECK.json", "BASELINE.json", "BASELINE.md", "SNIPPETS.md",
    "PAPERS.md", "TESTDATA.md", "rotate_query_numbers.py",
    "rotate_query_numbers_r3.py", "rotate_query_numbers_r4.py",
    "QUERY_ROTATION.md",
}
SKIP_PREFIXES = ("CORRECTNESS_r", "BENCH_r")

TOKEN = re.compile(r"\b([qz])(\d{2})(?=\b|_)")


def rewrite(text: str) -> str:
    def sub(m: re.Match) -> str:
        prefix, num = m.group(1), int(m.group(2))
        if prefix == "z":
            return ZSWAPS.get(f"z{num:02d}", m.group(0))
        if num not in SWAPS:
            return m.group(0)
        return SWAPS[num]

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
