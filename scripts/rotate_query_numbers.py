"""Registry query-name rotation — ONE parameterized script, every
round's mapping kept as data (round-8; replaces the seven per-round
scripts that had accumulated, r7-VERDICT item 9).

The round driver oracle-checks the first 50 registry names in sort
order; the standing policy (docs/QUERY_ROTATION.md) gives each
round's newest untested stems the window slots, while every evictee
keeps a green driver row of record and an in-window family sibling.
Mechanically a rotation is a simultaneous token rewrite over the
repo's .py/.md files: 2-3-digit q/r prefixes swap in ONE pass (each
token rewritten at most once, so a name entering a slot can never be
re-matched by its evictee's mapping), descriptive suffixes unchanged.

Usage::

    python scripts/rotate_query_numbers.py r8          # apply round 8
    python scripts/rotate_query_numbers.py --list      # show rounds

Historical artifacts (VERDICT/ADVICE/CORRECTNESS_r*/BENCH_r* and this
script) are never rewritten — each rotation's tables below are the
provenance record for re-deriving any name's history. Rounds r2/r3
were full bijections over two-digit numbers (expressed as generators
below); r4 onward are sparse swap tables. Re-applying a historical
round to today's tree is NOT meaningful (the names it maps from no
longer exist) — the tables are data, the only applyable round is the
newest one, enforced below.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path("/root/repo")


def _bijection(in_window_old: list[int], out_window_old: list[int]) -> dict:
    """r2/r3-style full renumbering over q01..q99: in-window names get
    1..N in the given order, the rest 51..; returned in the sparse
    {old_num: "qNN"} form the applier consumes."""
    rot: dict[int, int] = {}
    for new, old in enumerate(in_window_old, start=1):
        rot[old] = new
    for new, old in enumerate(out_window_old, start=51):
        rot[old] = new
    assert sorted(rot) == list(range(1, 100))
    assert sorted(rot.values()) == list(range(1, 100))
    return {old: f"q{new:02d}" for old, new in rot.items()}


# ---------------------------------------------------------------------------
# The mapping tables, one entry per round: {"q": {num: "rNN"|"qNN"},
# "r": {num: "qNN"}, "z": {...}} — q-table rewrites qNN tokens,
# r-table rNNN tokens, z-table the round-4 z-prefixed staging names.
# ---------------------------------------------------------------------------

ROTATIONS: dict[str, dict[str, dict]] = {
    "r2": {
        "q": _bijection(
            [8, 9, 24] + list(range(51, 72)) + [74] + list(range(75, 100)),
            list(range(1, 8)) + list(range(10, 24)) + list(range(25, 51)) + [72, 73],
        ),
        "r": {},
    },
    "r3": {
        "q": _bijection(
            list(range(51, 58)) + list(range(59, 100)) + [6, 46],
            [58] + list(range(1, 6)) + list(range(7, 46)) + list(range(47, 51)),
        ),
        "r": {},
    },
    "r4": {
        "q": {
            63: "q18", 65: "q27", 68: "q29", 70: "q33", 72: "q36",
            18: "r29", 27: "r30", 29: "r31", 33: "r32", 36: "r33",
            39: "r34", 41: "r35",
        },
        "r": {},
        "z": {"z01": "q39", "z02": "q41"},
    },
    "r5": {
        "q": {
            81: "q02", 82: "q03", 83: "q04", 84: "q05", 85: "q06",
            86: "q07", 87: "q08", 88: "q09", 89: "q10", 90: "q12",
            91: "q13", 92: "q14", 93: "q16", 94: "q17", 95: "q20",
            96: "q21", 97: "q22", 98: "q23", 99: "q25", 76: "q31",
            77: "q34", 78: "q35", 79: "q37", 80: "q42", 74: "q45",
            2: "r37", 3: "r38", 4: "r39", 5: "r40", 6: "r41",
            7: "r42", 8: "r43", 9: "r44", 10: "r45", 12: "r46",
            13: "r47", 14: "r48", 16: "r49", 17: "r50", 20: "r51",
            21: "r52", 22: "r53", 23: "r54", 25: "r55", 31: "r56",
            34: "r57", 35: "r58", 37: "r59", 42: "r60", 45: "r61",
            46: "r62",
        },
        "r": {36: "q46"},
    },
    "r6": {
        "q": {
            3: "r68", 4: "r69", 5: "r70", 6: "r71", 7: "r72",
            8: "r73", 9: "r74", 10: "r75", 12: "r76", 13: "r77",
            14: "r78", 16: "r79", 17: "r80", 21: "r81", 23: "r82",
            31: "r83", 34: "r84", 73: "q34",
        },
        "r": {
            63: "q03", 64: "q04", 65: "q05", 66: "q06", 67: "q07",
            38: "q08", 39: "q09", 45: "q10", 50: "q12", 51: "q13",
            52: "q14", 54: "q16", 55: "q17", 56: "q21", 61: "q23",
            62: "q31",
        },
    },
    "r6b": {
        "q": {20: "r102", 28: "r103", 33: "r104", 35: "r105", 40: "r106", 43: "r107"},
        "r": {92: "q20", 94: "q28", 97: "q33", 98: "q35", 99: "q40", 100: "q43"},
    },
    "r7": {
        "q": {
            4: "r116", 9: "r117", 10: "r118", 11: "r119", 14: "r120",
            16: "r121", 20: "r122", 21: "r123", 22: "r124", 23: "r125",
            24: "r126", 30: "r127", 36: "r128", 34: "r129", 48: "r130",
            49: "r131",
        },
        "r": {
            90: "q04", 91: "q09", 93: "q10", 95: "q11", 96: "q14",
            101: "q16", 108: "q20", 109: "q21", 110: "q22", 111: "q23",
            112: "q24", 113: "q30", 114: "q36", 115: "q34", 102: "q48",
            105: "q49",
        },
    },
    # Round 8: the round-7 late stem (events taxonomy dim), the four
    # round-8 feature stems (SQL DDL, corpus user views, the two S19
    # delete paths), and the four r6b churn evictees return for
    # re-attestation. Evictees are r7-green, none are bench-tagged
    # (the BENCH_r{N}.json series keys stay comparable), every family
    # keeps an in-window sibling (q29/q41 for L3; q19/q23/q08 for
    # L5/R5; q02 for R8; q29 for L4; q49 for U; entering q45=ann_lsh
    # and q47=media_resize are themselves family cover for L3/L8),
    # and every row covering round-8-touched code (routing, corpus
    # routing, user projections, bucketed deploys) stays in-window.
    "r8": {
        "q": {
            3: "r137",   # q03_ann_pq (L3: q29/q41 + entering ann_lsh)
            12: "r138",  # q12_token_counts (L5: q19/q23/q08)
            13: "r139",  # q13_sentiment (R8: q02 pipeline)
            17: "r140",  # q17_token_embeddings (L4: q29)
            37: "r141",  # q37_scalar_udf (U1: q49)
            42: "r142",  # q42_udtf (U5: q49)
            45: "r143",  # q45_media_meta_extract (L8: entering media_resize)
            47: "r144",  # q47_sequence_packing (L9: q32 adjacents)
            50: "r145",  # q50_column_profile (L10: row of record)
        },
        "r": {
            132: "q03",  # sql_events_category_rollup (S17 taxonomy dim)
            133: "q12",  # matview_ddl_sql (E1c)
            134: "q13",  # corpus_user_view_sql (S16 v3)
            135: "q17",  # delete_documents_sql (S19)
            136: "q37",  # delete_orders_sql (S19)
            103: "q42",  # pii_scrub (churn return)
            104: "q45",  # ann_lsh (churn return)
            106: "q47",  # media_resize (churn return)
            107: "q50",  # semantic_dedup (churn return)
        },
    },
    # Round 9: the two round-8 late stems (S19 DML spellings) and the
    # four round-9 feature stems (INSERT DML, the two predicate DELETE
    # lowerings, the L24 classifier) enter. Evictees are r8-green, none
    # bench-tagged, every family keeps an in-window sibling (detail in
    # docs/QUERY_ROTATION.md).
    "r9": {
        "q": {
            9: "r152",   # q09_sql_distinct_keys (E1b: q11/q04 cover)
            15: "r153",  # q15_quality_gate (L13: q42 + entering L24)
            16: "r154",  # q16_sql_events_scan (scan routing: q28/q36; S15: q40/q43)
            20: "r155",  # q20_user_projection_sql (S16: q12/q13/q34)
            32: "r156",  # q32_training_mix_pipeline (L20: q25)
            35: "r157",  # q35_sql_arm_measures (arms: q33/q34/q14)
        },
        "r": {
            146: "q09",  # sql_delete_dml (S19 DML, r8 late)
            147: "q15",  # sql_expire_events (S19b TTL, r8 late)
            148: "q16",  # sql_insert_dml (E1d)
            149: "q20",  # sql_delete_predicate (S19 predicate lowering)
            150: "q32",  # sql_expire_dml (S19b DML lowering)
            151: "q35",  # quality_classifier (L24)
        },
    },
    # Round 10: the four round-9 late stems — the round-9 flagship
    # features (E1e UPDATE, E1f MERGE, S22 time travel + RESTORE),
    # which landed after the r9 rotation commit and therefore have no
    # driver row yet — enter the window (r9-VERDICT item 1). Evictees
    # are r9-green, none bench-tagged, every family keeps an in-window
    # sibling (detail in docs/QUERY_ROTATION.md).
    "r10": {
        "q": {
            23: "r162",  # q23_sql_stopword_profile (S15: q24/q30/q36/q40/q43 family; L5: q19)
            33: "r163",  # q33_sql_triple_arm (S13 arms: q14/q34 + q04..q12 SQL rows)
            40: "r164",  # q40_sql_docs_profile (S15 docs: q17/q36 + q13 corpus view)
            43: "r165",  # q43_sql_events_rollup (S15 events: q03/q15/q32)
        },
        "r": {
            158: "q23",  # sql_update_dml (E1e over S21)
            159: "q33",  # sql_merge_dml (E1f, both clauses)
            160: "q40",  # sql_time_travel (S22 snapshot read)
            161: "q43",  # sql_restore (S22 rollback verb)
        },
    },
    # Round 10, second pass (the round's OWN feature stems, rotated in
    # the same round they landed — closing the "landed after the
    # rotation commit" gap pattern r9-VERDICT item 1 called out):
    # the widened-DML rows (E1e conjunction/arithmetic), the S23
    # change feed, and the L25 hybrid-retrieval fusion enter. Evictees
    # are r9-green, none bench-tagged, families keep in-window
    # siblings (detail in docs/QUERY_ROTATION.md).
    "r10b": {
        "q": {
            24: "r170",  # q24_sql_sources_dim_cube (S17 arms: q03 stays)
            30: "r171",  # q30_sql_sources_dim_raw (S17 arms: q03 stays)
            34: "r172",  # q34_user_arm_projection_sql (S16: q12/q13)
            41: "r173",  # q41_semantic_dedup_ivf (L18: q50; L3: q29/q45)
        },
        "r": {
            166: "q24",  # sql_update_conjunction (E1e widened WHERE)
            167: "q30",  # sql_update_arithmetic (E1e arithmetic SET)
            168: "q34",  # table_changes (S23 change feed)
            169: "q41",  # hybrid_rrf (L25 fusion)
        },
    },
    # Round 11: the round's OWN feature stems enter in the round they
    # landed (the r10/r10b two-pass discipline) — the conditional-
    # MERGE rows (E1f-b: the CDC changelog apply and the
    # prune-to-source clause). Evictees are r10-green, neither
    # bench-tagged, families keep in-window siblings; every row over
    # round-11-touched code (the DML front door, snapshots/staging,
    # delete paths) stays in-window (detail in docs/QUERY_ROTATION.md).
    "r11": {
        "q": {
            11: "r176",  # q11_sql_count_distinct (E1b/S13: q04/q10/q14 + q05..q07; A2 exact-distinct stays local)
            45: "r177",  # q45_ann_lsh (L3: q29 exact cosine in-window + q41's dense leg; PQ local r137)
        },
        "r": {
            174: "q11",  # sql_merge_cdc (E1f-b: one-statement changelog apply)
            175: "q45",  # sql_merge_prune (E1f-b: NOT MATCHED BY SOURCE delete)
        },
    },
}

SKIP = {
    "VERDICT.md", "ADVICE.md", "PROGRESS.jsonl", "COPYCHECK.json",
    "LEAKCHECK.json", "BASELINE.json", "BASELINE.md", "SNIPPETS.md",
    "PAPERS.md", "TESTDATA.md", "rotate_query_numbers.py",
    "QUERY_ROTATION.md",
}
SKIP_PREFIXES = ("CORRECTNESS_r", "BENCH_r")

# 2-3 digit prefixes, single simultaneous pass: a slot's new occupant
# can never be re-matched because each token is rewritten exactly
# once. Greedy \d{2,3} keeps bare r10-style tokens not in the tables
# untouched.
TOKEN = re.compile(r"\b([qrz])(\d{2,3})(?=\b|_)")


def _map_token(prefix: str, num: int, tables: dict[str, dict]) -> str | None:
    """New token for a qNN/rNNN/zNN token, or None when unmapped."""
    if prefix == "z":
        return tables.get("z", {}).get(f"z{num:02d}")
    table = tables["q"] if prefix == "q" else tables["r"]
    new = table.get(num)
    if new is None:
        return None
    return new if isinstance(new, str) else f"q{new:02d}"


def rewrite(text: str, tables: dict[str, dict]) -> str:
    """Token-level rewrite — .md prose only (no identifiers there)."""

    def sub(m: re.Match) -> str:
        return _map_token(m.group(1), int(m.group(2)), tables) or m.group(0)

    return TOKEN.sub(sub, text)


# -- .py files: rename REGISTERED query names only (round-8 ADVICE
# item 4: the token pass renamed an unrelated local variable `q12`
# inside a function body — harmless that time, but a bare-identifier
# rewrite could silently rename a meaningful symbol). A .py rewrite
# therefore touches only full registered names (`q12_matview_ddl_sql`
# and every string/def/test reference to it), collected from the
# @query registrations in the tree.

_REGISTERED = re.compile(r"@query\(\s*[\"']([qrz]\d{2,3}_\w+)[\"']")


def registered_names(py_files: list[Path]) -> set[str]:
    names: set[str] = set()
    for path in py_files:
        for m in _REGISTERED.finditer(path.read_text()):
            names.add(m.group(1))
    return names


def full_name_map(names: set[str], tables: dict[str, dict]) -> dict[str, str]:
    out: dict[str, str] = {}
    for name in names:
        token, _, rest = name.partition("_")
        new = _map_token(token[0], int(token[1:]), tables)
        if new is not None:
            out[name] = f"{new}_{rest}"
    return out


def rewrite_py(text: str, name_map: dict[str, str]) -> str:
    if not name_map:
        return text
    # one simultaneous pass over full names: suffixes are unique and
    # target tokens unused, so a rewritten name can never re-match
    pat = re.compile(
        r"\b(?:" + "|".join(re.escape(n) for n in sorted(name_map, key=len, reverse=True)) + r")\b"
    )
    return pat.sub(lambda m: name_map[m.group(0)], text)


def main() -> None:
    if len(sys.argv) != 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        sys.exit(0)
    if sys.argv[1] == "--list":
        for name in ROTATIONS:
            print(name)
        sys.exit(0)
    name = sys.argv[1]
    newest = list(ROTATIONS)[-1]
    if name != newest:
        sys.exit(
            f"only the newest rotation ({newest}) is applyable; "
            f"{name!r} is a historical record (its source names no "
            "longer exist in the tree)"
        )
    tables = ROTATIONS[name]
    changed = []
    paths = []
    for path in sorted(REPO.rglob("*")):
        if path.suffix not in {".py", ".md"} or not path.is_file():
            continue
        if path.name in SKIP or ".git" in path.parts or "spark-warehouse" in path.parts:
            continue
        if path.name.startswith(SKIP_PREFIXES):
            continue
        paths.append(path)
    name_map = full_name_map(
        registered_names([p for p in paths if p.suffix == ".py"]), tables
    )
    unmatched = {
        f"{p}{n:02d}" if p == "q" else f"{p}{n}"
        for p, t in (("q", tables["q"]), ("r", tables["r"]))
        for n in t
    } - {k.split("_", 1)[0] for k in name_map}
    if unmatched:
        sys.exit(f"mapping entries match no registered query: {sorted(unmatched)}")
    for path in paths:
        old = path.read_text()
        new = rewrite_py(old, name_map) if path.suffix == ".py" else rewrite(old, tables)
        if new != old:
            path.write_text(new)
            changed.append(str(path.relative_to(REPO)))
    print(f"applied {name}; rewrote:", *changed, sep="\n  ")


if __name__ == "__main__":
    main()
