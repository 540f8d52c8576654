"""Pattern-level SQL rewrite rules — engine optimizations that fire on
RECOGNIZED SHAPES in any user query, not on a per-query lookup table.

First rule (r9, promoted from the hand rewrites of TPC-DS q9/q28/q88 —
VERDICT r8 task #4): N scalar subqueries aggregating the SAME bare
table under different predicates collapse into ONE conditional-
aggregate pass.

    (select avg(x) from t where p1) ... (select count(*) from t where p2)
        ==>
    with __cond_agg_t as (
        select avg(case when p1 then x end) a0,
               count(case when p2 then 1 end) a1
        from t where (p1) or (p2))
    ... (select a0 from __cond_agg_t) ... (select a1 from __cond_agg_t)

Why it is sound: a CASE-guarded aggregate ignores rows where the guard
is false (NULL input), so each a_i aggregates exactly the p_i rows; the
OR-filter drops only rows no subquery would read. Empty-match semantics
are preserved: a global aggregate over zero rows yields one row of
NULLs (and count() = 0), identical to the scalar subquery's result.
The rewritten subqueries all read the one-row CTE, which Catalyst's
MergeScalarSubqueries folds into a single shared subquery — one scan
of t instead of N (the plan-pin tests assert the scan count).

Why it matters at scale: the reference plans each scalar subquery as
its own subplan over a fresh scan (BatchExecCalc over repeated
TableSourceScan), and Catalyst does the same — N predicates over a
100 TB fact table = N full scans. This rule makes it one.

Recognition gates (strict — fire only when provably safe):
  * subquery form: (SELECT agg(col|*) FROM table WHERE pred), one
    aggregate, one bare table (no alias, no join, no GROUP BY/HAVING)
  * agg in COUNT/SUM/AVG/MIN/MAX
  * pred contains no nested subquery or parentheses-nesting beyond
    plain grouping, and every identifier in it is a column of the
    table (resolved through the caller-provided ``columns_of``) — this
    excludes correlated subqueries (their predicates reference outer
    aliases, e.g. TPC-DS q6's ``j.i_category = i.i_category``)
  * at least two such subqueries over the same table (one collapses
    nothing)
"""

from __future__ import annotations

import re
from collections.abc import Callable

_AGG_HEAD = re.compile(
    r"\(\s*select\s+(count|sum|avg|min|max)\s*\(\s*(\*|[\w]+)\s*\)\s*"
    r"from\s+([A-Za-z_]\w*)\s+where\s+",
    re.I,
)

# identifiers (excluding string literals and numbers)
_IDENT = re.compile(r"\b[A-Za-z_]\w*\b")

_SQL_WORDS = {
    "and", "or", "not", "between", "in", "like", "is", "null", "case",
    "when", "then", "else", "end", "true", "false", "exists", "cast",
    "as", "int", "bigint", "double", "decimal", "varchar", "date",
    "interval", "coalesce", "abs",
}


def _find_subqueries(text: str):
    """Yield (start, end, agg, col, table, pred) for each candidate
    scalar-aggregate subquery; end is the index AFTER the closing
    paren. Paren scan skips single-quoted literals."""
    for m in _AGG_HEAD.finditer(text):
        start = m.start()
        depth, i = 0, start
        n = len(text)
        while i < n:
            c = text[i]
            if c == "'":
                i += 1
                while i < n and text[i] != "'":
                    i += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        if depth != 0:
            continue
        end = i + 1
        pred = text[m.end():i].strip()
        yield start, end, m.group(1).lower(), m.group(2), m.group(3).lower(), pred


def _pred_is_local(pred: str, cols: set[str]) -> bool:
    """True when every identifier in pred is a column of the table (or
    a recognized SQL keyword) — i.e. the subquery is uncorrelated and
    self-contained."""
    if "(" in pred or ")" in pred:
        return False  # keep the first rule conservative: flat predicates
    low = re.sub(r"'[^']*'", "''", pred)  # strip literal contents
    if re.search(r"\bselect\b", low, re.I):
        return False
    for ident in _IDENT.findall(low):
        w = ident.lower()
        if w in _SQL_WORDS or w.isdigit():
            continue
        if w not in cols:
            return False
    return True


def scalar_subqueries_to_conditional_agg(
    text: str,
    columns_of: Callable[[str], set[str] | None],
    min_count: int = 2,
) -> str | None:
    """Apply the rule; returns the rewritten SQL, or None when it does
    not fire. ``columns_of(table)`` returns the table's column-name set
    (lowercase) or None when the table is unknown (→ skip)."""
    groups: dict[str, list[tuple[int, int, str, str, str]]] = {}
    for start, end, agg, col, table, pred in _find_subqueries(text):
        cols = columns_of(table)
        if cols is None:
            continue
        cols = {c.lower() for c in cols}
        if col != "*" and col.lower() not in cols:
            continue  # aggregated column must belong to the table too
        if not _pred_is_local(pred, cols):
            continue
        groups.setdefault(table, []).append((start, end, agg, col, pred))
    # pick tables with >= min_count candidate subqueries; reject any
    # whose spans overlap (nested candidates — bail out, stay safe)
    chosen: list[tuple[str, list[tuple[int, int, str, str, str]]]] = []
    spans: list[tuple[int, int]] = []
    for table, subs in sorted(groups.items()):
        if len(subs) < min_count:
            continue
        ok = True
        allspans = spans + [(s, e) for s, e, *_ in subs]
        allspans.sort()
        for (s1, e1), (s2, e2) in zip(allspans, allspans[1:]):
            if s2 < e1:
                ok = False
                break
        if ok:
            chosen.append((table, subs))
            spans = allspans
    if not chosen:
        return None
    # build one CTE per table and substitute back to front
    ctes: list[str] = []
    repl: list[tuple[int, int, str]] = []
    for table, subs in chosen:
        cte = f"__cond_agg_{table}"
        cols_sql: list[str] = []
        preds: list[str] = []
        for k, (s, e, agg, col, pred) in enumerate(subs):
            inner = "1" if col == "*" else col
            cols_sql.append(
                f"{agg}(case when {pred} then {inner} end) a{k}"
            )
            preds.append(f"({pred})")
            repl.append((s, e, f"(select a{k} from {cte})"))
        ctes.append(
            f"{cte} as (select {', '.join(cols_sql)}\n"
            f" from {table} where {' or '.join(preds)})"
        )
    out = text
    for s, e, r in sorted(repl, reverse=True):
        out = out[:s] + r + out[e:]
    cte_sql = ", ".join(ctes)
    m = re.match(r"^\s*with\b", out, re.I)
    if m:
        out = out[:m.end()] + " " + cte_sql + "," + out[m.end():]
    else:
        out = f"with {cte_sql}\n{out}"
    return out
