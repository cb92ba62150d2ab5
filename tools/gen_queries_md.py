"""Regenerate QUERIES.md from the query registry.

One line per registered query, grouped by the name-prefix families the
library uses. Run after registering a new query:

    python tools/gen_queries_md.py        # writes QUERIES.md
    python tools/gen_queries_md.py --check  # exit 1 if stale
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = [
    ("q", "TPC-H suite (adapted to the slimmed schema)"),
    ("w", "Window / BI analytics"),
    ("s", "Set operations, grouping sets, sampling & splits"),
    ("a", "Aggregation patterns"),
    ("e", "Event-stream analytics"),
    ("f", "SQL function families"),
    ("t", "Text analysis (training-data pipeline)"),
    ("d", "Deduplication & contamination"),
    ("v", "Vector / embedding similarity"),
    ("k", "Sketches & approximate algorithms (all audited)"),
    ("m", "Multimodal (image / audio / video)"),
    ("g", "Graph algorithms"),
    ("c", "Chunking & sequence packing"),
    ("p", "Pipeline compositions"),
    ("dq", "Data-quality audits"),
    ("j", "Join strategies"),
]

HEADER = """# Query library index

One line per registered query (auto-generated from the registry docs
by tools/gen_queries_md.py; do not hand-edit). Every entry has a
DuckDB oracle and hash-matches it at sf0.01 and sf0.1 under BOTH gate
replicas (fetchall and pandas-dtype fetch); plan shapes for the
scale-sensitive ones are pinned in tests/test_plans.py.
"""


def _summary(doc: str, limit: int = 172) -> str:
    doc = " ".join(doc.split())
    sent = doc.split(". ")[0]
    if not sent.endswith("."):
        sent += "."
    if len(sent) > limit + 4:
        sent = sent[:limit] + "...."
    return sent


def render() -> str:
    from ice_spark.queries.registry import QUERIES, load_all

    load_all()
    out = [HEADER, "", f"**{len(QUERIES)} queries.**", ""]
    # longest matching prefix wins (dq* is data-quality, not dedup)
    by_section: dict[str, list[str]] = {p: [] for p, _ in SECTIONS}
    missing = []
    for n in QUERIES:
        hits = [p for p, _ in SECTIONS if n.startswith(p)]
        if not hits:
            missing.append(n)
            continue
        by_section[max(hits, key=len)].append(n)
    if missing:
        raise SystemExit(f"queries outside every section: {sorted(missing)}")
    for prefix, title in SECTIONS:
        names = sorted(by_section[prefix])
        if not names:
            continue
        out += ["", f"## {title} ({len(names)})", ""]
        for n in names:
            out.append(f"- `{n}` — {_summary(QUERIES[n].doc)}")
    return "\n".join(out) + "\n"


def main() -> int:
    text = render()
    if "--check" in sys.argv:
        current = open("QUERIES.md").read()
        if current != text:
            print("QUERIES.md is stale — run python tools/gen_queries_md.py")
            return 1
        print("QUERIES.md up to date")
        return 0
    with open("QUERIES.md", "w") as f:
        f.write(text)
    print(f"QUERIES.md regenerated ({text.count(chr(10))} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
