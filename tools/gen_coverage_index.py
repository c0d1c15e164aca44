"""Regenerate COVERAGE.md's "Full query index" section from the live
driver contract (__spark_entry__.py), so the committed index can never
drift from the declared inventory. Rewrites everything from the
"## Full query index" heading to the end of its bullet list, keeping
the prose paragraph that follows the heading up to the first bullet
UNTOUCHED except for the query/oracle counts on its first line.

Usage: python tools/gen_coverage_index.py   (edits COVERAGE.md in place)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry

    qs = list(entry.queries())
    oracles = set(entry.oracle_sql())
    n_q, n_o = len(qs), len(oracles)

    path = os.path.join(REPO, "COVERAGE.md")
    text = open(path).read()
    head_at = text.index("## Full query index")
    head_end = text.index("\n", head_at)
    after = text[head_end:]
    # prose runs from the heading to the first bullet; bullets run to
    # the next heading or EOF
    first_bullet = after.index("\n- `")
    prose = after[:first_bullet]
    rest = after[first_bullet:]
    m = re.search(r"\n(?=## )", rest)
    tail = rest[m.start():] if m else "\n"

    # refresh the counts sentence at the top of the prose
    prose = re.sub(
        r"\n\n\d+ queries[^;]*;\s*\d+ with DuckDB oracles,\s*\d+ rows-only",
        f"\n\n{n_q} queries (+1 where Pillow is importable — the gated "
        f"jpeg_decode_stats_fast twin); {n_o} with DuckDB oracles, "
        f"{n_q - n_o} rows-only",
        prose,
        count=1,
    )

    # strip glued bullet fragments a pre-r10 version of this tool left
    # at the prose tail (it concatenated the first bullet without a
    # newline, so each regeneration folded one bullet into the prose)
    prose = re.sub(r"(- `[^`]+` \((oracle|rows-only)\))+\s*$", "", prose)
    if not prose.endswith("\n"):
        prose += "\n"

    bullets = "\n".join(
        f"- `{name}` ({'oracle' if name in oracles else 'rows-only'})"
        for name in qs
    )
    out = text[:head_at] + "## Full query index" + prose + bullets + "\n" + tail
    with open(path, "w") as f:
        f.write(out)
    print(f"rewrote index: {n_q} queries, {n_o} oracles")


if __name__ == "__main__":
    main()
