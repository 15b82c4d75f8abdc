"""Mechanical freshness accounting over the driver's CORRECTNESS_r*.json rows.

Motivation (VERDICT r10/r11/r12, "What's wrong" #1 each round): hand-maintained
prose claims about driver-adjudication freshness drifted from the artifacts
three rounds running — r12's rotation note claimed "every entry's latest driver
row is r7+" while six entries were last adjudicated r5.  This module makes the
claim a computed artifact instead of prose:

* ``compute_strata()`` recomputes, from the CORRECTNESS_r*.json files and the
  live registry (``operators.all_queries()``), each entry's latest driver
  adjudication round, its green/red status at that adjudication, and the set
  of entries that have never seen a driver row.
* ``python -m local_llm_iceberg_cdw_spark.freshness --write`` regenerates the
  committed ``FRESHNESS.md`` artifact from those numbers.
* ``tests/test_freshness_claims.py`` pins FRESHNESS.md == recomputation, so a
  stale committed claim fails the suite instead of surviving into a verdict.

COVERAGE.md and the rotation note in ``operators/__init__.py`` must cite
FRESHNESS.md rather than hand-quoting strata numbers.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

REPO_ROOT = Path(__file__).resolve().parent.parent
FRESHNESS_MD = REPO_ROOT / "FRESHNESS.md"

_HEADER = "# FRESHNESS — driver-adjudication strata (generated, do not hand-edit)"


def correctness_rounds(repo_root: Path = REPO_ROOT) -> dict[int, dict[str, dict[str, Any]]]:
    """All CORRECTNESS_r*.json records, keyed by round number."""
    out: dict[int, dict[str, dict[str, Any]]] = {}
    for path in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        out[int(m.group(1))] = json.loads(path.read_text())
    return out


def row_is_green(row: dict[str, Any]) -> bool:
    """Driver row verdict: rows+schema must match, hash must match when the
    driver computed one (``hash_match`` is None for rows-only checks on
    non-SQL-expressible ops), and no error."""
    if row.get("err"):
        return False
    if not (row.get("rows_match") and row.get("schema_match")):
        return False
    return row.get("hash_match") in (True, None)


def registry_names() -> list[str]:
    from .operators import all_queries

    return list(all_queries().keys())


def compute_strata(
    repo_root: Path = REPO_ROOT,
    max_round: int | None = None,
    registry: list[str] | None = None,
) -> dict[str, Any]:
    """Latest-adjudication strata over rounds <= ``max_round`` (default: all).

    Returns a dict with ``as_of`` (newest round consumed), ``latest``
    (op -> round), ``strata`` (round -> sorted ops), ``reds`` (ops whose
    latest row is not green), ``never_adjudicated`` (registry ops with no
    driver row), and ``oldest_round`` (min over adjudicated registry ops).
    """
    rounds = correctness_rounds(repo_root)
    if max_round is not None:
        rounds = {r: d for r, d in rounds.items() if r <= max_round}
    if registry is None:
        registry = registry_names()
    latest: dict[str, int] = {}
    latest_row: dict[str, dict[str, Any]] = {}
    for rnd in sorted(rounds):
        for op, row in rounds[rnd].items():
            latest[op] = rnd
            latest_row[op] = row
    in_registry = {op: r for op, r in latest.items() if op in set(registry)}
    strata: dict[int, list[str]] = {}
    for op, rnd in sorted(in_registry.items()):
        strata.setdefault(rnd, []).append(op)
    reds = sorted(op for op, row in latest_row.items() if op in in_registry and not row_is_green(row))
    never = sorted(set(registry) - set(latest))
    return {
        "as_of": max(rounds) if rounds else 0,
        "latest": in_registry,
        "strata": {r: sorted(ops) for r, ops in sorted(strata.items())},
        "reds": reds,
        "never_adjudicated": never,
        "oldest_round": min(in_registry.values()) if in_registry else None,
        "registry_size": len(registry),
    }


def render_markdown(s: dict[str, Any]) -> str:
    lines = [
        _HEADER,
        "",
        "Regenerate with `python -m local_llm_iceberg_cdw_spark.freshness --write`;",
        "`tests/test_freshness_claims.py` pins this file against recomputation from",
        "the CORRECTNESS_r*.json artifacts and the live registry.",
        "",
        f"- as_of: r{s['as_of']:02d}",
        f"- registry_size: {s['registry_size']}",
        f"- adjudicated: {len(s['latest'])}",
        f"- never_adjudicated: {len(s['never_adjudicated'])}",
        f"- oldest_adjudication_round: {s['oldest_round']}",
        f"- reds_at_latest_adjudication: {len(s['reds'])}",
        "",
        "## Strata (latest driver row per registry entry)",
        "",
    ]
    for rnd, ops in s["strata"].items():
        lines.append(f"### r{rnd:02d} ({len(ops)})")
        lines.append("")
        lines.append(", ".join(f"`{o}`" for o in ops))
        lines.append("")
    lines.append(f"### never adjudicated ({len(s['never_adjudicated'])})")
    lines.append("")
    lines.append(", ".join(f"`{o}`" for o in s["never_adjudicated"]) or "(none)")
    lines.append("")
    if s["reds"]:
        lines.append("### RED at latest adjudication")
        lines.append("")
        lines.append(", ".join(f"`{o}`" for o in s["reds"]))
        lines.append("")
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    s = compute_strata()
    md = render_markdown(s)
    if "--write" in argv:
        FRESHNESS_MD.write_text(md + "\n")
        print(f"wrote {FRESHNESS_MD} (as_of r{s['as_of']:02d})")
    else:
        print(md)
    return 0


if __name__ == "__main__":  # pragma: no cover
    import sys

    raise SystemExit(main(sys.argv[1:]))
