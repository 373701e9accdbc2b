"""Regenerate SURVEY.md §2.12's operator inventory table from the
registry (round-9 verdict item #8: the prose inventory had grown into
run-on text nobody could mechanically check).

For every registered operator: name → implementing module:line of its
queries() callable → the first driver round that graded it green
(CORRECTNESS_r{N}.json) → whether it has a full value oracle or the
weaker rows-only check. The table is spliced between the BEGIN/END
markers in SURVEY.md, so `--write` keeps the coverage map in lockstep
with `api._PRIORITY` (the count line is asserted against it).

Usage:
    python tools/gen_survey_inventory.py          # print to stdout
    python tools/gen_survey_inventory.py --write  # splice into SURVEY.md
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- BEGIN GENERATED OPERATOR INVENTORY (tools/gen_survey_inventory.py) -->"
END = "<!-- END GENERATED OPERATOR INVENTORY -->"


def first_green_round() -> dict[str, int]:
    first: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            ok = row.get("rows_match") and row.get("schema_match") and (
                row.get("hash_match") in (True, None)
            )
            if ok and name not in first:
                first[name] = r
    return first


def build_table() -> str:
    from replicator_spark import api

    qs = api.queries()
    oracles = api.oracle_sql()
    assert len(api._PRIORITY) == len(qs), (len(api._PRIORITY), len(qs))
    first = first_green_round()
    lines = [
        BEGIN,
        "",
        f"The full registry — **{len(qs)} operators**, every one a "
        "`queries()` entry graded by the driver (generated from "
        "`replicator_spark/api.py`; regenerate with "
        "`python tools/gen_survey_inventory.py --write`):",
        "",
        "| operator | implementation | oracle | first green |",
        "|---|---|---|---|",
    ]
    for name in sorted(qs):
        fn = qs[name]
        mod = fn.__module__.replace("replicator_spark.", "")
        path = mod.replace(".", "/") + ".py"
        line = fn.__code__.co_firstlineno
        oracle = "full SQL" if name in oracles else "rows-only"
        rnd = first.get(name)
        rnd_s = f"r{rnd}" if rnd else "queued"
        lines.append(f"| `{name}` | `{path}:{line}` | {oracle} | {rnd_s} |")
    lines += ["", END]
    return "\n".join(lines)


def main() -> None:
    table = build_table()
    if "--write" not in sys.argv[1:]:
        print(table)
        return
    survey = os.path.join(REPO, "SURVEY.md")
    src = open(survey).read()
    if BEGIN in src:
        pre = src[: src.index(BEGIN)]
        post = src[src.index(END) + len(END) :]
        open(survey, "w").write(pre + table + post)
    else:
        raise SystemExit("markers not found in SURVEY.md; splice manually")
    print("SURVEY.md updated")


if __name__ == "__main__":
    main()
