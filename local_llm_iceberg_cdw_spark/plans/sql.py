"""SQL entry point — the guards the reference applies to generated SQL.

The reference's only query IR is a SQL string produced by an LLM; before
execution it (a) strips markdown code fences and a leading ``SQLQuery:``
label, (b) keeps only the first statement
(``/root/reference/app-gradio.py:149-155``; harder variant
``all_in_one_PC.py:219-229``), and (c) contractually requires Impala's
``FOR SYSTEM_TIME AS OF`` time-travel syntax (``app-gradio.py:138``).

Our engine executes with ``spark.sql``; the only genuinely custom piece is
the Impala→Spark dialect rewrite of the time-travel clause — everything
else Catalyst parses natively (backtick identifiers, ANSI predicates).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_CODE_FENCE = re.compile(r"```(?:sql)?\s*(.*?)```", re.DOTALL | re.IGNORECASE)
_SQLQUERY_LABEL = re.compile(r"^\s*SQLQuery\s*:\s*", re.IGNORECASE)
# Impala/SQL:2011: FOR SYSTEM_TIME AS OF <ts>  →  Spark/Iceberg: TIMESTAMP AS OF <ts>
_SYSTEM_TIME = re.compile(r"\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b", re.IGNORECASE)
_SYSTEM_VERSION = re.compile(r"\bFOR\s+SYSTEM_VERSION\s+AS\s+OF\b", re.IGNORECASE)


def clean_generated_sql(raw: str) -> str:
    """Code-fence strip + label strip + first-statement truncation
    (behavioral parity with app-gradio.py:149-155)."""
    text = raw.strip()
    m = _CODE_FENCE.search(text)
    if m:
        text = m.group(1).strip()
    text = _SQLQUERY_LABEL.sub("", text)
    if ";" in text:
        text = text.split(";", 1)[0]
    return text.strip()


def translate_dialect(sql: str) -> str:
    """Rewrite Impala time-travel clauses to Spark SQL equivalents."""
    sql = _SYSTEM_TIME.sub("TIMESTAMP AS OF", sql)
    sql = _SYSTEM_VERSION.sub("VERSION AS OF", sql)
    return sql


# `<table> TIMESTAMP AS OF '<ts>'` / `<table> VERSION AS OF <n>` — the
# post-translate_dialect form of the prompt contract's time-travel clause.
# The identifier may be qualified (db.orders, `db`.`orders`): the WHOLE
# dotted name is captured so a registered simple name never swallows the
# bare tail of a qualified one (db.orders must not become db.<view>).
_IDENT = r"`[^`]+`|\w+"
_AS_OF = re.compile(
    rf"(?P<tbl>(?:{_IDENT})(?:\s*\.\s*(?:{_IDENT}))*)\s+"
    r"(?P<kind>TIMESTAMP|VERSION)\s+AS\s+OF\s+"
    r"(?P<val>'[^']*'|\d+)",
    re.IGNORECASE,
)


def _string_literal_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) spans of quoted string literals ('…' and "…", with
    doubled-quote AND backslash escapes — Spark SQL accepts ``'it\\'s'``
    by default) — matches starting inside one are SQL *data*, not
    time-travel clauses, and must not be rewritten.  Without the
    backslash rule an escaped quote would misalign the scan, letting a
    genuine clause after the literal pass through unbound."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(sql)
    while i < n:
        q = sql[i]
        if q in ("'", '"'):
            start = i
            i += 1
            while i < n:
                if sql[i] == "\\":  # backslash escape: skip escaped char
                    i += 2
                    continue
                if sql[i] == q:
                    if i + 1 < n and sql[i + 1] == q:  # '' / "" escape
                        i += 2
                        continue
                    break
                i += 1
            i += 1  # past the closing quote (or EOF on unterminated)
            spans.append((start, i))
        else:
            i += 1
    return spans


def _as_of_ms(literal: str) -> int:
    """ISO timestamp literal → epoch millis.  Naive literals are UTC —
    the session contract (`spark.sql.session.timeZone=UTC` everywhere in
    this engine), so both engines and the manifest's ``timestamp_ms``
    agree on the instant."""
    import datetime as _dt

    ts = _dt.datetime.fromisoformat(literal)
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return int(ts.timestamp() * 1000)


def bind_time_travel(spark: SparkSession, sql: str, snapshot_tables: dict) -> str:
    """Resolve time-travel clauses against snapshot-format tables: each
    ``t TIMESTAMP AS OF '…'`` / ``t VERSION AS OF n`` whose identifier
    names a table in ``snapshot_tables`` is materialized as a temp view
    of the HISTORICAL read (``SnapshotParquetTable.read(as_of/version)``)
    and the clause is rewritten to that view — the bridge that makes the
    reference's Impala/Iceberg time-travel contract (`app-gradio.py:138`)
    executable on the manifest format without the Iceberg jar.  Names
    not in the registry are left for Spark to resolve (a real Iceberg
    catalog table parses the clause natively); qualified names
    (``db.orders``, backticked or not) are matched against their full
    dotted form — a registered simple name never rewrites the bare tail
    of a qualified one.  Clauses INSIDE string literals are data, not
    SQL, and pass through untouched.

    Side effects & staleness: binding REGISTERS session temp views whose
    contents pin the table state AT BIND TIME — an as-of-timestamp view
    re-bound after new commits may resolve to a different snapshot, and
    the views live until the session drops them.  View names are
    deterministic (table + kind + literal), so repeated binding is
    idempotent and plans are stable across runs."""
    literal_spans = _string_literal_spans(sql)

    def in_literal(pos: int) -> bool:
        return any(a <= pos < b for a, b in literal_spans)

    out: list[str] = []
    last = 0
    for m in _AS_OF.finditer(sql):
        if in_literal(m.start()):
            continue  # quoted data, e.g. SELECT 'orders TIMESTAMP AS OF …'
        # segment with the identifier grammar (not a naive dot-split): a
        # backticked segment may itself contain dots (`a.b` is ONE name)
        tbl = ".".join(
            part.strip("`") for part in re.findall(_IDENT, m.group("tbl"))
        )
        table = snapshot_tables.get(tbl)
        if table is None:
            continue  # unknown (or qualified-unregistered) name: pass through
        kind = m.group("kind").upper()
        val = m.group("val")
        if kind == "TIMESTAMP":
            df = table.read(as_of_timestamp_ms=_as_of_ms(val.strip("'")))
        elif val.startswith("'"):
            # Iceberg's ref form: VERSION AS OF 'tag_or_branch' resolves
            # through the refs table (a bare integer is a snapshot id)
            df = table.read(ref=val.strip("'"))
        else:
            df = table.read(version=int(val))
        view = (
            re.sub(r"\W", "_", tbl)
            + f"__{kind.lower()}_as_of_"
            + re.sub(r"\W", "_", val)
        )
        df.createOrReplaceTempView(view)
        out.append(sql[last:m.start()])
        out.append(view)
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def execute_sql(
    spark: SparkSession,
    raw: str,
    args: dict | None = None,
    snapshot_tables: dict | None = None,
) -> DataFrame:
    """Guarded execution of (possibly LLM-generated) SQL text.

    ``args`` are named parameters (``:name`` markers) bound by Spark —
    replacing the reference's hand-rolled quote-doubling escape
    (``/root/reference/create_iceberg.py:191``, F1 in SURVEY §2.8) with
    real parameterization; F2's backtick identifiers parse natively.
    ``snapshot_tables`` ({name: SnapshotParquetTable}) enables time
    travel on manifest-format tables — see ``bind_time_travel``.
    """
    sql = translate_dialect(clean_generated_sql(raw))
    if not sql:
        raise ValueError("empty SQL statement after cleanup")
    if snapshot_tables:
        sql = bind_time_travel(spark, sql, snapshot_tables)
    return spark.sql(sql, args=args) if args else spark.sql(sql)


def health_probe(spark: SparkSession) -> bool:
    """S11: the reference's connection probe (`SELECT 1`,
    all_in_one_PC.py:158)."""
    return spark.sql("SELECT 1").collect()[0][0] == 1
