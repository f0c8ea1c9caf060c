"""One-shot renumbering of registry query names (round-3 rotation).

The round driver oracle-checks the first 50 queries in name order.
Round 2 verified the current q01-q50 (48 green; math_functions and
column_profile failed on an int-vs-float dtype drift, fixed this
round). The current q51-q99 were last driver-checked in round 1 under
their pre-rotation names. This rotation renumbers so that:

- the 48 queries checked only in round 1 (current q51-q99 minus
  limit_offset) sort into the 50-query window for a fresh row,
- the two just-fixed queries (math_functions, column_profile) stay
  in-window as q49/q50 so the fix gets a hard green row,
- the 48 round-2-green queries move behind the window (their round-2
  rows stand as evidence; local pytest still checks all 99),
- limit_offset (trivial ORDER BY+LIMIT+OFFSET, round-1 green) is the
  one query left out-of-window by the 50-slot budget.

Applied once via `python scripts/rotate_query_numbers_r3.py`; kept for
provenance. The old->new map is appended to docs/QUERY_ROTATION.md.
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path("/root/repo")

# old number -> new number (bijection over 01..99)
ROTATION: dict[int, int] = {}

_in_window_old = (
    list(range(51, 58))     # 51..57
    + list(range(59, 100))  # 59..99 (58 limit_offset stays out)
    + [6, 46]               # re-verify the two round-2 hash failures
)
_out_window_old = (
    [58]
    + list(range(1, 6))     # 01..05
    + list(range(7, 46))    # 07..45
    + list(range(47, 51))   # 47..50
)
for new, old in enumerate(_in_window_old, start=1):
    ROTATION[old] = new
for new, old in enumerate(_out_window_old, start=51):
    ROTATION[old] = new

assert sorted(ROTATION) == list(range(1, 100))
assert sorted(ROTATION.values()) == list(range(1, 100))

# Historical round artifacts are never rewritten.
SKIP = {
    "VERDICT.md", "ADVICE.md", "PROGRESS.jsonl", "COPYCHECK.json",
    "LEAKCHECK.json", "BASELINE.json", "BASELINE.md", "SNIPPETS.md",
    "PAPERS.md", "TESTDATA.md", "rotate_query_numbers.py",
    "rotate_query_numbers_r3.py", "QUERY_ROTATION.md",
}
SKIP_PREFIXES = ("CORRECTNESS_r", "BENCH_r")

TOKEN = re.compile(r"\b([qQ])(\d{2})(?=\b|_)")


def rewrite(text: str) -> str:
    def sub(m: re.Match) -> str:
        prefix, num = m.group(1), int(m.group(2))
        if prefix == "Q" and num == 20:
            return m.group(0)  # Q20 fixed-point notation, not a query id
        if num not in ROTATION:
            return m.group(0)
        return f"{prefix}{ROTATION[num]:02d}"

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
