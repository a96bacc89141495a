"""File-level column statistics + predicate-based data skipping (scan
pruning) for the Iceberg-emulation catalog.

Real Iceberg keeps per-data-file lower/upper bounds + null counts in its
manifests and prunes files before planning tasks; at 10^12-document scale
this is THE difference between scanning a table and scanning the matching
fraction (a time-range or host-range query over a clustered corpus should
open ~selectivity × files, not all of them). This module supplies the same
mechanic for the emulated catalog:

* :func:`collect_file_stats` — read min/max/null-count per top-level scalar
  column straight out of the parquet FOOTER of each newly committed file
  (no data scan; the writer already computed the bounds). Cost is one
  footer read per NEW file per commit — O(commit), never O(table) — the
  same order as the ``stat()`` size probe the commit already does; a real
  Iceberg writer gets these numbers from the file-writer callback instead.
* :func:`parse_conjuncts` — a deliberately small SQL predicate parser:
  top-level ``AND`` of ``col <op> literal``, ``BETWEEN``, ``IN``,
  ``IS [NOT] NULL``. Anything it does not understand (OR, parens,
  functions, col-to-col) yields no pruning for that conjunct —
  NEVER a wrong prune.
* :func:`file_may_match` — the tri-state bound check per file entry.

Correctness contract: pruning is ADVISORY. ``catalog.read(where=...)``
always applies the full predicate with ``DataFrame.filter`` afterwards, so
a parser gap can only cost skipped pruning; only the bound arithmetic here
can drop rows, and that is what the differential fuzz in
tests/test_datafilter.py pins (random predicates: pruned read ≡ full scan +
filter).

String bounds stored in the manifest are truncated to
:data:`TRUNCATE_LEN` code points the way parquet-mr/Iceberg truncate:
a truncated MIN prefix is still a valid lower bound as-is; a truncated MAX
has its last incrementable code point bumped and the tail dropped, making
it strictly greater than every string sharing the prefix.

Timestamp caveat: parquet stores TIMESTAMP as UTC-adjusted micros while a
Spark literal is interpreted in the SESSION time zone, so timestamp
conjuncts participate in pruning only when the caller confirms the session
zone is UTC (``ts_utc=True`` — catalog.read checks
``spark.sql.session.timeZone``); otherwise they are conservatively kept.
"""

from __future__ import annotations

import datetime as _dt
import re

TRUNCATE_LEN = 64
_MAX_CP = 0x10FFFF

# ---------------------------------------------------------------------------
# stats collection (write side)
# ---------------------------------------------------------------------------


def _trunc_min(s: str) -> str:
    return s if len(s) <= TRUNCATE_LEN else s[:TRUNCATE_LEN]


def _trunc_max(s: str) -> str | None:
    """Upper bound after truncation: bump the rightmost incrementable code
    point of the prefix and drop the tail (parquet-mr's
    ``BinaryTruncator.INCREMENT`` shape). None = cannot truncate safely
    (pathological all-U+10FFFF prefix) — caller keeps the full string."""
    if len(s) <= TRUNCATE_LEN:
        return s
    prefix = s[:TRUNCATE_LEN]
    for i in range(len(prefix) - 1, -1, -1):
        cp = ord(prefix[i])
        if cp < _MAX_CP:
            return prefix[:i] + chr(cp + 1)
    return None


def _jsonable(v):
    """Manifest-storable form of a footer min/max value. None = give up on
    this column (unsupported type)."""
    if isinstance(v, bool) or isinstance(v, int):
        return v
    if isinstance(v, float):
        return v
    if isinstance(v, str):
        return v
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return None  # bytes (non-UTF8 binary), Decimal, etc. — skip column


def collect_file_stats(local_path: str) -> dict:
    """Per-column ``{col: {"min":…, "max":…, "nulls": n}}`` for the
    top-level scalar columns of one parquet file, from its footer only.

    Nested leaves (``a.list.element``) are ignored; a column whose stats
    any row group failed to write is dropped (all-null row groups are fine
    — they contribute null counts without bounds). Returns
    ``{"rows": n, "stats": {...}}``.
    """
    import pyarrow.parquet as pq

    md = pq.ParquetFile(local_path).metadata
    sch = md.schema
    # top-level scalar columns only: leaf path == column name (no dots)
    tops = {i: sch.column(i).path for i in range(md.num_columns)
            if "." not in sch.column(i).path}
    acc: dict = {c: {"min": None, "max": None, "nulls": 0} for c in tops.values()}
    dead: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i, col in tops.items():
            if col in dead:
                continue
            st = g.column(i).statistics
            n = g.num_rows
            if st is None or not st.has_null_count:
                dead.add(col)
                continue
            a = acc[col]
            a["nulls"] += st.null_count
            if not st.has_min_max:
                if st.null_count == n:
                    continue  # all-null group: bounds legitimately absent
                dead.add(col)
                continue
            mn, mx = _jsonable(st.min), _jsonable(st.max)
            if mn is None or mx is None:
                dead.add(col)
                continue
            if isinstance(mn, str):
                mn = _trunc_min(mn)
                mx2 = _trunc_max(mx)
                mx = mx if mx2 is None else mx2
            if a["min"] is None or mn < a["min"]:
                a["min"] = mn
            if a["max"] is None or mx > a["max"]:
                a["max"] = mx
    return {
        "rows": md.num_rows,
        "stats": {c: v for c, v in acc.items() if c not in dead},
    }


# ---------------------------------------------------------------------------
# predicate parsing (read side)
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>[-+]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][-+]?\d+)?)
      | (?P<op><=|>=|<>|!=|==|=|<|>)
      | (?P<lp>\()
      | (?P<rp>\))
      | (?P<comma>,)
      | (?P<ident>`[^`]+`|[A-Za-z_][A-Za-z_0-9.]*)
    )""",
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]] | None:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            return None if s[pos:].strip() else out
        pos = m.end()
        for kind in ("str", "num", "op", "lp", "rp", "comma", "ident"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


def _split_top_and(toks: list[tuple[str, str]]) -> list[list[tuple[str, str]]] | None:
    """Split on top-level AND, honouring the AND that belongs to BETWEEN.
    Any parenthesis nesting other than an IN-list makes the whole predicate
    unparseable (returns None → no pruning)."""
    parts, cur, depth, between = [], [], 0, 0
    for kind, v in toks:
        u = v.upper() if kind == "ident" else v
        if kind == "lp":
            depth += 1
        elif kind == "rp":
            depth -= 1
            if depth < 0:
                return None
        if kind == "ident" and u == "BETWEEN":
            between += 1
        if kind == "ident" and u == "AND" and depth == 0:
            if between:
                between -= 1
            else:
                parts.append(cur)
                cur = []
                continue
        cur.append((kind, v))
    parts.append(cur)
    return parts if depth == 0 else None


def _lit(kind: str, v: str):
    """Literal token → python value tagged ('num'|'str'|'bool'|'null', v)."""
    if kind == "str":
        return ("str", v[1:-1].replace("''", "'"))
    if kind == "num":
        f = float(v)
        return ("num", int(v) if re.fullmatch(r"[-+]?\d+", v) else f)
    u = v.upper()
    if u == "TRUE":
        return ("bool", True)
    if u == "FALSE":
        return ("bool", False)
    if u == "NULL":
        return ("null", None)
    return None


def _ident(v: str) -> str:
    return v[1:-1] if v.startswith("`") else v


def parse_conjuncts(where: str) -> list[dict]:
    """Parse a WHERE string into prunable conjunct dicts. Conjuncts the
    grammar cannot express are silently omitted (they still run in the
    post-scan filter). Returns [] when nothing is prunable."""
    toks = _tokenize(where)
    if toks is None:
        return []
    parts = _split_top_and(toks)
    if parts is None:
        return []
    out = []
    for p in parts:
        c = _parse_one(p)
        if c is not None:
            out.append(c)
    return out


def _parse_one(p: list[tuple[str, str]]) -> dict | None:
    kinds = [k for k, _ in p]
    ups = [v.upper() if k == "ident" else v for k, v in p]

    def lit_at(i):
        # DATE '...' / TIMESTAMP '...' prefixes: the tag is decorative — the
        # column type drives coercion at prune time
        return _lit(p[i][0], p[i][1])

    # col IS [NOT] NULL
    if len(p) == 3 and kinds == ["ident", "ident", "ident"] and ups[1] == "IS" and ups[2] == "NULL":
        return {"op": "isnull", "col": _ident(p[0][1])}
    if (len(p) == 4 and kinds == ["ident"] * 4 and ups[1] == "IS"
            and ups[2] == "NOT" and ups[3] == "NULL"):
        return {"op": "notnull", "col": _ident(p[0][1])}

    # typed literal prefix: strip DATE/TIMESTAMP keyword before a string
    q = []
    i = 0
    while i < len(p):
        if (p[i][0] == "ident" and ups[i] in ("DATE", "TIMESTAMP")
                and i + 1 < len(p) and p[i + 1][0] == "str"):
            i += 1
            continue
        q.append(p[i])
        i += 1
    p = q
    kinds = [k for k, _ in p]
    ups = [v.upper() if k == "ident" else v for k, v in p]

    # col op lit | lit op col
    if len(p) == 3 and kinds[1] == "op":
        op = {"==": "=", "<>": "!="}.get(p[1][1], p[1][1])
        if kinds[0] == "ident" and kinds[2] in ("str", "num", "ident"):
            lit = lit_at(2)
            if lit is not None:
                return {"op": op, "col": _ident(p[0][1]), "lit": lit}
        if kinds[2] == "ident" and kinds[0] in ("str", "num"):
            lit = lit_at(0)
            flip = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}.get(op, op)
            if lit is not None:
                return {"op": flip, "col": _ident(p[2][1]), "lit": lit}
        return None

    # col BETWEEN a AND b
    if (len(p) == 5 and kinds[0] == "ident" and ups[1] == "BETWEEN"
            and ups[3] == "AND"):
        lo, hi = lit_at(2), lit_at(4)
        if lo is not None and hi is not None:
            return {"op": "between", "col": _ident(p[0][1]), "lo": lo, "hi": hi}
        return None

    # col [NOT] IN (a, b, ...)
    not_in = len(p) > 1 and ups[1] == "NOT"
    base = 2 if not_in else 1
    if (len(p) >= base + 3 and kinds[0] == "ident" and ups[base] == "IN"
            and kinds[base + 1] == "lp" and kinds[-1] == "rp"):
        vals = []
        for k, v in p[base + 2:-1]:
            if k == "comma":
                continue
            lit = _lit(k, v)
            if lit is None:
                return None
            vals.append(lit)
        if not vals:
            return None
        if not_in:
            return None  # NOT IN prunes ~never; leave to the filter
        return {"op": "in", "col": _ident(p[0][1]), "lits": vals}
    return None


# ---------------------------------------------------------------------------
# pruning (read side)
# ---------------------------------------------------------------------------


def _coerce(lit, family: str, ts_utc: bool):
    """Literal → comparable value in the column's domain, or raise
    ValueError (caller keeps the file)."""
    tag, v = lit
    if family in ("int", "float"):
        if tag == "num":
            return v
        if tag == "str":
            return float(v)
    elif family == "str":
        if tag == "str":
            return v
    elif family == "bool":
        if tag == "bool":
            return v
    elif family == "date":
        if tag == "str":
            return _dt.date.fromisoformat(v.strip())
    elif family == "ts":
        if not ts_utc:
            raise ValueError("non-UTC session zone: no timestamp pruning")
        if tag == "str":
            return _dt.datetime.fromisoformat(v.strip())
    raise ValueError(f"cannot coerce {lit!r} to {family}")


def _decode_bound(v, family: str):
    if v is None:
        return None
    if family == "date":
        return _dt.date.fromisoformat(v)
    if family == "ts":
        return _dt.datetime.fromisoformat(v)
    return v


_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float", "string": "str",
    "boolean": "bool", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts",
}


def schema_families(schema) -> dict:
    """StructType → {col: family} for stat-prunable columns."""
    out = {}
    for f in schema.fields:
        fam = _FAMILY.get(f.dataType.simpleString())
        if fam is not None:
            out[f.name] = fam
    return out


def file_may_match(fentry: dict, conjuncts: list[dict],
                   families: dict, ts_utc: bool) -> bool:
    """True unless the file's bounds PROVE no row can satisfy every
    conjunct. Missing stats / unknown columns / coercion failures all keep
    the file."""
    stats = fentry.get("stats") or {}
    rows = fentry.get("rows")
    for c in conjuncts:
        col = c["col"]
        fam = families.get(col)
        st = stats.get(col)
        if st is None:
            continue
        nulls = st.get("nulls")
        if c["op"] == "isnull":
            if nulls == 0:
                return False
            continue
        if c["op"] == "notnull":
            if rows is not None and nulls == rows:
                return False
            continue
        if fam is None:
            continue
        try:
            mn = _decode_bound(st.get("min"), fam)
            mx = _decode_bound(st.get("max"), fam)
            if mn is None or mx is None:
                # bounds absent: all-null file can't satisfy a comparison
                if rows is not None and nulls == rows:
                    return False
                continue
            if c["op"] == "between":
                lo = _coerce(c["lo"], fam, ts_utc)
                hi = _coerce(c["hi"], fam, ts_utc)
                if mx < lo or mn > hi:
                    return False
                continue
            if c["op"] == "in":
                vals = [_coerce(x, fam, ts_utc) for x in c["lits"]]
                if all(v < mn or v > mx for v in vals):
                    return False
                continue
            v = _coerce(c["lit"], fam, ts_utc)
            op = c["op"]
            if fam == "float" and op in (">", ">=", "!="):
                # Spark orders NaN above every value, and footer min/max
                # silently exclude NaN (probed: pyarrow writes (1.0, 3.0)
                # for [1.0, NaN, 3.0]) — a NaN row satisfies these ops even
                # when the recorded max says nothing can. Never prune them
                # on float columns; <, <=, =, IN, BETWEEN stay safe (NaN
                # cannot satisfy those).
                continue
            if op == "=" and (v < mn or v > mx):
                return False
            if op == "!=" and mn == mx == v and nulls == 0:
                return False
            if op == "<" and mn >= v:
                return False
            if op == "<=" and mn > v:
                return False
            if op == ">" and mx <= v:
                return False
            if op == ">=" and mx < v:
                return False
        except (ValueError, TypeError):
            continue  # un-coercible literal / mixed types: keep the file
    return True
