"""Spark-SQL → DuckDB dialect bridge for the logic-corpus replay.

The reference's sql-tests corpus is written in Spark's dialect.  To
VALUE-verify as many statements as possible against the independent
DuckDB oracle (instead of waiving them as "dialect gap"), this module
mechanically rewrites the well-defined syntactic differences:

  * double-quoted string literals   -> single-quoted ('' escaping)
  * backslash escape sequences      -> resolved (\\n, \\t, \\ddd octal,
    \\uXXXX — Spark's non-ANSI string semantics)
  * adjacent string literals        -> concatenated ('a' 'b' == 'ab')
  * x'ABCD' hex binary literal      -> unhex('ABCD')
  * backtick identifiers            -> double-quoted identifiers
  * typed numeric suffixes          -> CAST(n AS TINYINT/SMALLINT/
    BIGINT/DOUBLE) (Y/S/L/D/BD — BD maps to DOUBLE: the comparator
    normalizes all numerics to 10-significant-digit floats, so decimal
    width is immaterial while out-of-range literals still error on the
    Spark side)
  * a div b                         -> a // b
  * SORT BY                         -> ORDER BY (per-partition sort;
    the comparator sorts rows, so the value set is what's checked)
  * CROSS JOIN t ON cond            -> JOIN t ON cond (Spark treats a
    conditioned cross join as inner)
  * LEFT ANTI/SEMI JOIN             -> ANTI/SEMI JOIN
  * GROUP BY e1, e2 WITH CUBE       -> GROUP BY CUBE(e1, e2)
  * GROUP BY cols GROUPING SETS(s)  -> GROUP BY GROUPING SETS(s)
  * FROM VALUES r1, r2 [AS t(c..)]  -> FROM (VALUES (r1), (r2)) ...
  * FROM range(a [,b [,c [,np]]])   -> FROM range(CAST(a AS BIGINT)..)
    AS _r(id)  (numPartitions arg dropped — a physical hint)
  * nvl -> ifnull, size -> len, sort_array(x) -> list_sort(x, 'ASC',
    'NULLS FIRST'), array() -> list_value(), struct() -> row(),
    grouping_id() -> grouping(), current_timestamp() -> now(),
    pmod(a,b) -> (((a)%(b)+(b))%(b)), nvl2(a,b,c) -> CASE WHEN

Everything here is a SYNTAX mapping with identical semantics — any
statement whose *meaning* differs between the engines stays out of
this file and carries a reasoned entry in sql_corpus_ledger.py.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# String-literal scanner: split a Spark statement into code and string
# segments, resolving Spark escape semantics.
# ---------------------------------------------------------------------------

_OCTAL = re.compile(r"[0-7]{1,3}")
_SIMPLE_ESC = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
               "0": "\0", "'": "'", '"': '"', "\\": "\\", "%": "\\%",
               "_": "\\_"}


def _unescape(body: str) -> str:
    """Resolve Spark's backslash escapes (Hive-compatible, non-ANSI)."""
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch != "\\" or i + 1 >= n:
            out.append(ch)
            i += 1
            continue
        nxt = body[i + 1]
        if nxt == "u" and i + 5 < n:
            try:
                out.append(chr(int(body[i + 2: i + 6], 16)))
                i += 6
                continue
            except ValueError:
                pass
        m = _OCTAL.match(body, i + 1)
        if m and nxt in "01234567":
            out.append(chr(int(m.group(0), 8)))
            i += 1 + len(m.group(0))
            continue
        if nxt in _SIMPLE_ESC:
            out.append(_SIMPLE_ESC[nxt])
            i += 2
            continue
        # Unknown escape: Spark drops the backslash.
        out.append(nxt)
        i += 2
    return "".join(out)


def _scan(stmt: str) -> list[tuple[str, str]]:
    """-> [(kind, text)]: kind in {code, str, hex}. str text is the
    RESOLVED python string; hex text is the raw hex digits."""
    segs: list[tuple[str, str]] = []
    code: list[str] = []
    i, n = 0, len(stmt)
    while i < n:
        ch = stmt[i]
        if ch in ("'", '"'):
            # x'...' / X'...' hex binary literal?
            is_hex = False
            if ch == "'" and code and code[-1] in ("x", "X") and (
                    len(code) == 1 or not (code[-2].isalnum() or code[-2] == "_")):
                is_hex = True
                code.pop()
            if code:
                segs.append(("code", "".join(code)))
                code = []
            j, body = i + 1, []
            while j < n:
                c = stmt[j]
                if c == "\\" and not is_hex and j + 1 < n:
                    body.append(c + stmt[j + 1])
                    j += 2
                    continue
                if c == ch:
                    break
                body.append(c)
                j += 1
            raw = "".join(body)
            segs.append(("hex", raw) if is_hex else ("str", _unescape(raw)))
            i = j + 1
            continue
        if ch == "`":
            j = stmt.find("`", i + 1)
            j = n if j < 0 else j
            code.append('"' + stmt[i + 1: j] + '"')
            i = j + 1
            continue
        code.append(ch)
        i += 1
    if code:
        segs.append(("code", "".join(code)))
    return segs


def _emit_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# Code-segment rewrites
# ---------------------------------------------------------------------------

# Optional leading minus is folded INTO the literal (Spark's parser
# does the same: -128Y is a valid tinyint while 128Y alone overflows).
# The lookbehind set keeps `a-1L` (binary minus on an identifier/paren)
# out; the corpus never writes `<expr> - <suffixed literal>`.
_NUM_SUFFIX = re.compile(
    r"(?<![\w.)\]])(-?\s*(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
    r"(BD|Y|S|L|D)\b", re.I)
_SUFFIX_TYPE = {"Y": "TINYINT", "S": "SMALLINT", "L": "BIGINT",
                "D": "DOUBLE", "BD": "DOUBLE"}
# `9.e+1` / `9.` — DuckDB requires a digit after the decimal point.
_TRAILING_DOT = re.compile(r"\b(\d+)\.(?=[eE][+-]?\d|\s|,|\)|$)")

#: Hive cast-alias functions (reference: sql-compatibility-functions.sql)
_CAST_ALIAS = {
    "boolean": "BOOLEAN", "tinyint": "TINYINT", "smallint": "SMALLINT",
    "int": "INTEGER", "bigint": "BIGINT", "float": "REAL",
    "double": "DOUBLE", "decimal": "DECIMAL(10,0)", "string": "VARCHAR",
    "binary": "BLOB", "date": "DATE", "timestamp": "TIMESTAMP",
}

_SIMPLE_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(r"\bdiv\b", re.I), "//"),
    (re.compile(r"\bsort\s+by\b", re.I), "ORDER BY"),
    (re.compile(r"\bcross\s+join\s+(\w+)\s+on\b", re.I), r"JOIN \1 ON"),
    (re.compile(r"\bleft\s+anti\s+join\b", re.I), "ANTI JOIN"),
    (re.compile(r"\bleft\s+semi\s+join\b", re.I), "SEMI JOIN"),
    (re.compile(r"\bgroup\s+by\s+(.+?)\s+with\s+(cube|rollup)\b",
                re.I | re.S), r"GROUP BY \2(\1)"),
    (re.compile(r"\bgroup\s+by\s+.+?\s+(grouping\s+sets)\b", re.I | re.S),
     r"GROUP BY \1"),
    (re.compile(r"\bnvl\s*\(", re.I), "ifnull("),
    (re.compile(r"\bsize\s*\(", re.I), "len("),
    (re.compile(r"\barray\s*\(", re.I), "list_value("),
    (re.compile(r"\bstruct\s*\(", re.I), "row("),
    (re.compile(r"\bgrouping_id\s*\(", re.I), "grouping("),
    (re.compile(r"\bcurrent_timestamp\s*\(\s*\)", re.I), "now()"),
]


def _find_close(text: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _split_args(body: str) -> list[str]:
    args, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        args.append(tail)
    return args


def _rewrite_call(text: str, name: str, fn) -> str:
    """Replace every call of `name` using fn(args) -> str or None (skip)."""
    pat = re.compile(r"\b" + name + r"\s*\(", re.I)
    pos = 0
    while True:
        m = pat.search(text, pos)
        if not m:
            return text
        close = _find_close(text, m.end() - 1)
        if close < 0:
            return text
        args = _split_args(text[m.end(): close])
        repl = fn(args)
        if repl is None or _preceded_by_as(text, m.start()):
            pos = m.end()
            continue
        text = text[: m.start()] + repl + text[close + 1:]
        pos = m.start() + len(repl)


def _preceded_by_as(text: str, start: int) -> bool:
    """True when the call site is really a type in `CAST(x AS decimal(38,0))`."""
    return re.search(r"\bas\s*$", text[:start], re.I) is not None


def _pmod(args: list[str]) -> str | None:
    if len(args) != 2:
        return None
    a, b = args
    return f"((({a}) % ({b}) + ({b})) % ({b}))"


def _nvl2(args: list[str]) -> str | None:
    if len(args) != 3:
        return None
    a, b, c = args
    return f"(CASE WHEN ({a}) IS NOT NULL THEN ({b}) ELSE ({c}) END)"


def _sort_array(args: list[str]) -> str | None:
    if len(args) == 1:
        return f"list_sort({args[0]}, 'ASC', 'NULLS FIRST')"
    if len(args) == 2 and args[1].strip().lower() in ("true", "false"):
        order = "'ASC', 'NULLS FIRST'" if args[1].strip().lower() == "true" \
            else "'DESC', 'NULLS LAST'"
        return f"list_sort({args[0]}, {order})"
    return None


def _cast_alias(type_name: str):
    def fn(args: list[str]) -> str | None:
        if len(args) != 1:
            return None
        return f"CAST({args[0]} AS {type_name})"
    return fn


def _rewrite_index(text: str) -> str:
    """Spark `arr[i]` is 0-based; DuckDB lists are 1-based -> [(i)+1]."""
    out, i, n = [], 0, len(text)
    while i < n:
        ch = text[i]
        last = out[-1][-1] if out and out[-1] else ""
        if ch == "[" and (last.isalnum() or last in "_]"):
            depth, j = 1, i + 1
            while j < n and depth:
                if text[j] == "[":
                    depth += 1
                elif text[j] == "]":
                    depth -= 1
                j += 1
            inner = _rewrite_index(text[i + 1: j - 1])
            out.append(f"[({inner}) + 1]")
            i = j
            continue
        out.append(ch)
        i += 1
    return "".join(out)


_CLAUSE_END = re.compile(
    r"\b(as|where|group|order|limit|union|intersect|except|having|on|join"
    r"|inner|left|right|full|cross|natural)\b|[)]", re.I)


def _rewrite_values(text: str) -> str:
    """FROM/JOIN VALUES r1, r2 [alias] -> FROM (VALUES (r1), (r2)) [alias]."""
    pat = re.compile(r"\b(from|join)\s+values\b", re.I)
    out = text
    while True:
        m = pat.search(out)
        if not m:
            return out
        i = m.end()
        rows, depth, cur, end = [], 0, [], len(out)
        j = i
        while j < len(out):
            ch = out[j]
            if depth == 0:
                mm = _CLAUSE_END.match(out, j)
                if mm and ch != ")":
                    end = j
                    break
                if ch == ")":
                    end = j
                    break
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                rows.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
            j += 1
        else:
            end = len(out)
        tail = "".join(cur).strip()
        if tail:
            rows.append(tail)
        wrapped = ", ".join(
            r if r.startswith("(") else f"({r})" for r in rows if r)
        out = (out[: m.start()] + m.group(1) + " (VALUES " + wrapped + ") "
               + out[end:])


def _rewrite_range(text: str) -> str:
    """FROM range(args) -> FROM range(CAST(.. AS BIGINT)..) AS _r(id).
    A 4th Spark arg (numPartitions) is a physical hint — dropped."""
    pat = re.compile(r"\b(from|join)\s+range\s*\(", re.I)
    pos = 0
    while True:
        m = pat.search(text, pos)
        if not m:
            return text
        close = _find_close(text, m.end() - 1)
        if close < 0:
            return text
        args = _split_args(text[m.end(): close])
        if len(args) == 4:  # Spark's numPartitions — a physical hint
            args = args[:3]
        new_args = ", ".join(f"CAST({a} AS BIGINT)" for a in args)
        repl = f"{m.group(1)} range({new_args}) AS _r(id)"
        text = text[: m.start()] + repl + text[close + 1:]
        pos = m.start() + len(repl)


def to_duckdb(stmt: str) -> str:
    segs = _scan(stmt)
    # Merge adjacent string literals (Spark implicit concatenation).
    merged: list[tuple[str, str]] = []
    for kind, text in segs:
        if (kind == "str" and merged and merged[-1][0] == "str"):
            merged[-1] = ("str", merged[-1][1] + text)
            continue
        if (kind == "code" and text.strip() == "" and len(merged) >= 1
                and merged[-1][0] == "str"):
            # whitespace between two strings: look ahead handled by next merge
            merged.append(("ws", text))
            continue
        if kind == "str" and len(merged) >= 2 and merged[-1][0] == "ws" \
                and merged[-2][0] == "str":
            merged[-2] = ("str", merged[-2][1] + text)
            merged.pop()
            continue
        merged.append((kind, text))

    # Protect finalized string/hex literals behind placeholders so the
    # statement-level rewrites (VALUES rows, suffixes, calls) operate on
    # the WHOLE statement without ever touching literal contents.
    placeholders: list[str] = []
    parts: list[str] = []
    for kind, text in merged:
        if kind == "str":
            placeholders.append(_emit_str(text))
            parts.append(f" __SQSTR{len(placeholders) - 1}X ")
        elif kind == "hex":
            placeholders.append(f"unhex('{text}')")
            parts.append(f" __SQSTR{len(placeholders) - 1}X ")
        else:  # code / ws
            parts.append(text)
    t = "".join(parts)

    t = _NUM_SUFFIX.sub(
        lambda m: f"CAST({m.group(1)} AS {_SUFFIX_TYPE[m.group(2).upper()]})", t)
    t = _TRAILING_DOT.sub(r"\1.0", t)
    for pat, repl in _SIMPLE_RULES:
        t = pat.sub(repl, t)
    t = _rewrite_call(t, "pmod", _pmod)
    t = _rewrite_call(t, "nvl2", _nvl2)
    t = _rewrite_call(t, "sort_array", _sort_array)
    for alias, type_name in _CAST_ALIAS.items():
        if re.search(r"\b" + alias + r"\s*\(", t, re.I):
            t = _rewrite_call(t, alias, _cast_alias(type_name))
    t = _rewrite_values(t)
    t = _rewrite_range(t)
    t = _rewrite_index(t)

    for i, lit in enumerate(placeholders):
        t = t.replace(f"__SQSTR{i}X", lit)
    return t
