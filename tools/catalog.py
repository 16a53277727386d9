"""Regenerate CATALOG.md: the full registry surface, grouped by module,
one line per query (name, oracle status, first docstring sentence).

Usage: python tools/catalog.py  (writes CATALOG.md at the repo root)
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dissertation_iceberg_spark.queries.registry import (  # noqa: E402
    REGISTRY,
    _ensure_loaded,
)


def _source_doc(fn) -> str:
    """Some query functions build their docstring with
    '\"\"\"...\"\"\".format(...)' — an expression, so ``__doc__`` is None.
    Fall back to the first triple-quoted literal in the source."""
    import inspect

    try:
        src = inspect.getsource(fn)
    except OSError:
        return ""
    m = re.search(r'"""(.*?)"""', src, re.S)
    return m.group(1) if m else ""


def first_sentence(doc: str, fn=None) -> str:
    if not (doc or "").strip() and fn is not None:
        doc = _source_doc(fn)
    text = " ".join((doc or "").split())
    m = re.match(r"(.+?\.)(\s|$)", text)
    s = m.group(1) if m else text[:160]
    return s if len(s) <= 240 else s[:237] + "..."


def main() -> None:
    _ensure_loaded()
    by_module: dict[str, list] = defaultdict(list)
    for name, spec in REGISTRY.items():
        mod = spec.fn.__module__.rsplit(".", 1)[-1]
        by_module[mod].append((name, spec))

    n_total = len(REGISTRY)
    n_oracled = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    lines = [
        "# CATALOG — the full query surface",
        "",
        f"{n_total} registered queries, {n_oracled} oracle-checked "
        "(DuckDB value-hash parity at sf0.001/0.01/0.1); the rest are "
        "rows-only by nature (model output / driver-side solves / "
        "Pandas-UDF decode stand-ins). Regenerate with "
        "`python tools/catalog.py`.",
        "",
    ]
    for mod in sorted(by_module):
        entries = sorted(by_module[mod], key=lambda kv: kv[0])
        lines.append(f"## {mod} ({len(entries)})")
        lines.append("")
        for name, spec in entries:
            tag = "" if spec.oracle is not None else " *(rows-only)*"
            lines.append(f"- `{name}`{tag} — {first_sentence(spec.doc, spec.fn)}")
        lines.append("")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CATALOG.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {n_total} queries in {len(by_module)} modules")


if __name__ == "__main__":
    main()
