"""One-shot renumbering of registry query names (round-6 rotation).

Round-5 verdict item 2: rotate the round-5 newcomers (r63_ann_pq,
r64_zorder_query — local-oracle green, never driver-checked) and the
round-5-churned out-of-window stems (text.py / similarity.py /
multimodal.py were all edited in round 5 while their stems stood on
round-4 rows) into the driver's 50-query window. Round 6 additionally
adds the three S13 projection-routing queries (r65-r67, new). 17
swaps; every evicted query carries a fresh round-5-green row of record
(CORRECTNESS_r05.json) and its §2 row either keeps an in-window
sibling or stands on that record (see docs/QUERY_ROTATION.md round-6
table).

Entrants (last hard row -> new window slot):
  r63_ann_pq           new r5  -> q03   r50_token_counts   r4 -> q12
  r64_zorder_query     new r5  -> q04   r51_sentiment      r4 -> q13
  r65_routed_pricing   new r6  -> q05   r52_bigram_lm      r4 -> q14
  r66_routed_star      new r6  -> q06   r54_bpe_token_counts r4 -> q16
  r67_routed_fallback  new r6  -> q07   r55_token_embeddings r4 -> q17
  r38_skipgram_pairs   r4      -> q08   r56_kmeans_embeddings r4 -> q21
  r39_vocab_build      r4      -> q09   r61_tfidf          r4 -> q23
  r45_encode_ids       r4      -> q10   r62_string_functions r4 -> q31
  q73_binary_ops       r2      -> q34

Applied once via ``python scripts/rotate_query_numbers_r6.py``; kept
for provenance. Historical round artifacts are never rewritten.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path("/root/repo")

# bare-token bijection over the two-digit prefix (descriptive suffixes
# travel with the token): old (prefix, NN) -> new token
QSWAPS: dict[int, str] = {
    # evicted (r5-green rows of record)
    3: "r68", 4: "r69", 5: "r70", 6: "r71", 7: "r72",
    8: "r73", 9: "r74", 10: "r75", 12: "r76", 13: "r77",
    14: "r78", 16: "r79", 17: "r80", 21: "r81", 23: "r82",
    31: "r83", 34: "r84",
    # entrant from the q5x+ out-window range
    73: "q34",
}
RSWAPS: dict[int, str] = {
    63: "q03", 64: "q04", 65: "q05", 66: "q06", 67: "q07",
    38: "q08", 39: "q09", 45: "q10", 50: "q12", 51: "q13",
    52: "q14", 54: "q16", 55: "q17", 56: "q21", 61: "q23",
    62: "q31",
}

SKIP = {
    "VERDICT.md", "ADVICE.md", "PROGRESS.jsonl", "COPYCHECK.json",
    "LEAKCHECK.json", "BASELINE.json", "BASELINE.md", "SNIPPETS.md",
    "PAPERS.md", "TESTDATA.md", "rotate_query_numbers.py",
    "rotate_query_numbers_r3.py", "rotate_query_numbers_r4.py",
    "rotate_query_numbers_r5.py", "rotate_query_numbers_r6.py",
    "QUERY_ROTATION.md",
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
