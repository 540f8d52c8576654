"""Pattern-level SQL rewrite rules — engine optimizations that fire on
RECOGNIZED SHAPES in any user query, not on a per-query lookup table.

Substrate (r11, VERDICT r10 task #4): recognition walks a real AST
(flink_spark/sqlast.py — span-preserving tokenizer + recursive-descent
parser) instead of the r9/r10 regex+mask machinery. Rewrites are still
SPAN SPLICES into the verbatim text (each AST node carries its
[start, end) source span), so the emission code — and therefore the
generated SQL — is unchanged from the regex substrate; only the
matching moved. A text the parser cannot handle DECLINES every rule
(parse-or-decline replaces the old decline-on-doubt regex gates).
Structural wins over the regex version:
  * clause scope is free — a WHERE conjunct IS a conjunct of that
    SelectCore's where tree, so the ADVICE r10 `not (p and E1 and E2)`
    / `(...) is false` / CASE-arm holes cannot exist by construction;
  * literal/comment masking is the tokenizer's job, not each rule's;
  * identifier resolution sees the real FROM list (derived-table
    bodies can no longer satisfy a bare-table-ref gate).

Rule #1 (r9, promoted from the hand rewrites of TPC-DS q9/q28/q88 —
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
  * agg in COUNT/SUM/AVG/MIN/MAX (no DISTINCT)
  * pred is a flat boolean over the table's own columns — no
    subqueries, function calls, or IN lists, and every identifier
    resolves through the caller-provided ``columns_of`` — this
    excludes correlated subqueries (their predicates reference outer
    aliases, e.g. TPC-DS q6's ``j.i_category = i.i_category``)
  * at least two such subqueries over the same table (one collapses
    nothing)
"""

from __future__ import annotations

import re
from collections.abc import Callable

from flink_spark.sqlast import (
    Between,
    BinOp,
    Case,
    DerivedTable,
    Exists,
    FuncCall,
    Ident,
    InList,
    InSubquery,
    IsNull,
    Literal,
    Node,
    Paren,
    ParseError,
    Query,
    ScalarSubquery,
    SelectCore,
    SetOp,
    Star,
    TableRef,
    UnaryOp,
    conjuncts,
    has_comment,
    parent_map,
    parse,
)

_AGGS = {"count", "sum", "avg", "min", "max"}

# nodes allowed inside a "flat local" predicate — the conservative
# lift-verbatim set (no parens-bearing constructs: no subqueries, no
# function calls, no IN lists, no nested Paren)
_FLAT_OK = (BinOp, UnaryOp, IsNull, Between, Ident, Literal, Case)


def _parse(text: str) -> Query | None:
    try:
        return parse(text)
    except ParseError:
        return None


def _resolve_col(parts: list[str], tables: list[str],
                 columns_of) -> str | None:
    """Resolve an identifier (as parts) against bare tables: returns
    the qualifying table name, or None when it is not an inner column."""
    if len(parts) == 2:
        t, col = parts
        if t in tables:
            cols = columns_of(t)
            if cols and col in {c.lower() for c in cols}:
                return t
        return None
    if len(parts) == 1:
        for t in tables:
            cols = columns_of(t)
            if cols and parts[0] in {c.lower() for c in cols}:
                return t
    return None


def _flat_local(expr: Node, resolve) -> bool:
    """True when ``expr`` uses only the flat-predicate node set and
    every identifier resolves through ``resolve`` (parts -> table or
    None) — i.e. the predicate is self-contained and safe to lift
    verbatim into generated SQL."""
    for node in expr.walk():
        if not isinstance(node, _FLAT_OK):
            return False
        if isinstance(node, Ident) and resolve(node.parts) is None:
            return False
    return True


def scalar_subqueries_to_conditional_agg(
    text: str,
    columns_of: Callable[[str], set[str] | None],
    min_count: int = 2,
) -> str | None:
    """Apply rule #1; returns the rewritten SQL, or None when it does
    not fire. ``columns_of(table)`` returns the table's column-name set
    (lowercase) or None when the table is unknown (→ skip)."""
    root = _parse(text)
    if root is None:
        return None
    groups: dict[str, list[tuple[int, int, str, str, str]]] = {}
    for node in root.walk():
        if not isinstance(node, ScalarSubquery):
            continue
        q = node.query
        if q.ctes or q.order_by or q.limit is not None:
            continue
        sel = q.body
        if not isinstance(sel, SelectCore) or sel.distinct:
            continue
        if sel.group_by or sel.having or sel.where is None:
            continue
        if len(sel.from_) != 1 or len(sel.items) != 1:
            continue
        ref = sel.from_[0]
        if not isinstance(ref, TableRef) or ref.alias is not None:
            continue
        item = sel.items[0]
        if item.alias is not None:
            continue
        fc = item.expr
        if not isinstance(fc, FuncCall) or fc.name not in _AGGS:
            continue
        if fc.distinct or fc.over is not None:
            continue
        if fc.star:
            col = "*"
        elif (len(fc.args) == 1 and isinstance(fc.args[0], Ident)
                and len(fc.args[0].parts) == 1):
            col = fc.args[0].parts[0]
        else:
            continue
        table = ref.name
        cols = columns_of(table)
        if cols is None:
            continue
        cols = {c.lower() for c in cols}
        if col != "*" and col not in cols:
            continue  # aggregated column must belong to the table too
        resolve = lambda p, _c=cols: (  # noqa: E731
            "t" if len(p) == 1 and p[0] in _c else None
        )
        if not _flat_local(sel.where, resolve):
            continue
        if has_comment(text, node.start, node.end):
            continue
        pred = sel.where.text(text).strip()
        groups.setdefault(table, []).append(
            (node.start, node.end, fc.name, col, pred)
        )
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
        for k, (s, e, agg, col, pred) in enumerate(sorted(subs)):
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


# ======================================================================
# Rule #2 (r10): per-channel existence predicates -> union-agg flag pass
# ======================================================================
#
#   where exists (select * from t1 where x = k1 and p1)
#     and (exists (select * from t2 where x = k2 and p2)
#          or not exists (select * from t3 where x = k3 and p3))
#       ==>
#   with __chan_flags_0 as (
#     select __key, max(case when __ch = 0 then 1 end) __f0, ...
#     from (select k1 as __key, 0 as __ch from t1 where p1
#           union all ...) u
#     where __key is not null group by __key)
#   ... where x in (select __key from __chan_flags_0
#                   where __f0 = 1 and (__f1 = 1 or __f2 is null))
#
# Why it is sound (each gate below enforces one premise):
#   * EXISTS is 2-valued; for a non-null outer key x, EXISTS_k(x) is
#     exactly "x is in channel k's key set", which max(case)=1 encodes;
#     NOT EXISTS_k(x) is "absent", which __fk IS NULL encodes (keys in
#     the CTE carry 1-or-NULL flags, never 0).
#   * Keys matching NO channel are absent from the CTE, so the IN is
#     FALSE for them. That equals the original only when the region
#     cannot be TRUE for such keys — guaranteed when every channel is
#     positive (all-FALSE inputs through an AND/OR-only combination is
#     FALSE), and, when a NOT EXISTS channel is present, by requiring a
#     POSITIVE channel as a top-level AND conjunct of the region.
#   * A NULL outer key: every EXISTS is FALSE (the correlation equality
#     never holds), so the original region is FALSE or fails the
#     mandatory positive conjunct; the rewrite's IN evaluates to
#     NULL/FALSE. NULL-vs-FALSE is indistinguishable where the region
#     sits, because the region is (a run of) TOP-LEVEL CONJUNCTS of a
#     WHERE clause — selection semantics, never under NOT / IS / CASE
#     (structural on the AST: a conjunct of SelectCore.where IS at
#     selection position; the ADVICE r10 boundary holes are
#     unrepresentable).
#   * `x IN (select k from t where p)` channels can differ from EXISTS
#     on NULL semantics only by returning NULL instead of FALSE (null
#     keys in the list); at a WHERE-conjunct position in an AND/OR-only
#     combination those select identically.
#
# Why it matters at scale: the reference plans each existence predicate
# as its own semi/anti join (SEMI_JOIN_RULES,
# FlinkStreamRuleSets.scala:34) — N channels over 100 TB facts = N
# shuffled joins against the outer key. The rewrite computes ALL
# channel flags in one partial-aggregatable pass over the unioned
# channels and joins ONCE.
#
# Recognition gates (strict — decline on any doubt):
#   * channel = [NOT] EXISTS (SELECT */1/col FROM bare_tables WHERE
#     conj) with exactly one correlation equality <outer> = <inner col>
#     and every other conjunct flat-local to the subquery's tables, or
#     <outer> IN (SELECT col FROM bare_table [WHERE local_pred]);
#     NOT IN is never touched (its NULL semantics don't survive).
#   * >= 2 channels, all correlating the SAME outer expression, in a
#     run of CONSECUTIVE top-level WHERE conjuncts each of which is an
#     AND/OR/paren combination of channels only.
#   * a NOT EXISTS channel requires a positive channel that is itself
#     one whole top-level conjunct of the region.
#   * all channel key columns must have the SAME type (``types_of``) so
#     UNION ALL cannot coerce keys and change equality semantics.


def _channel_from_exists(node: Exists, text: str, columns_of,
                         types_of) -> dict | None:
    q = node.query
    if q.ctes or q.order_by or q.limit is not None:
        return None
    sel = q.body
    if not isinstance(sel, SelectCore) or sel.distinct:
        return None
    if sel.group_by or sel.having or sel.where is None:
        return None
    if len(sel.items) != 1 or sel.items[0].alias is not None:
        return None
    it = sel.items[0].expr
    if not (isinstance(it, Star)
            or (isinstance(it, Literal) and it.val == "1")
            or (isinstance(it, Ident) and len(it.parts) <= 2)):
        return None
    tables: list[str] = []
    for ref in sel.from_:
        if not isinstance(ref, TableRef) or ref.alias is not None:
            return None
        tables.append(ref.name)
    if len(set(tables)) != len(tables):
        return None
    for t in tables:
        if columns_of(t) is None:
            return None
    corr = None
    locals_: list[str] = []
    resolve = lambda p: _resolve_col(p, tables, columns_of)  # noqa: E731
    for cj in conjuncts(sel.where):
        if (isinstance(cj, BinOp) and cj.op == "="
                and isinstance(cj.left, Ident)
                and isinstance(cj.right, Ident)):
            ra = resolve(cj.left.parts)
            rb = resolve(cj.right.parts)
            if (ra is None) != (rb is None):
                # one side inner, one side outer -> correlation
                if corr is not None:
                    return None  # two correlations: decline
                inner_node, outer_node = (
                    (cj.right, cj.left) if ra is None
                    else (cj.left, cj.right)
                )
                if len(outer_node.parts) > 2:
                    return None
                corr = (outer_node, inner_node,
                        ra if rb is None else rb)
                continue
        if not _flat_local(cj, resolve):
            return None
        locals_.append(cj.text(text).strip())
    if corr is None:
        return None
    outer_node, key_node, key_table = corr
    key_col = key_node.parts[-1]
    typ = types_of(key_table, key_col) if types_of else None
    if types_of and typ is None:
        return None
    return {
        "start": node.start, "end": node.end, "negative": node.negated,
        "outer": ".".join(outer_node.parts),
        "outer_txt": outer_node.text(text),
        "key": key_node.text(text), "tables": ", ".join(tables),
        "local": " and ".join(locals_), "type": typ,
    }


def _channel_from_in(node: InSubquery, text: str, columns_of,
                     types_of) -> dict | None:
    if node.negated:
        return None  # NOT IN: NULL semantics don't survive the flags
    if not isinstance(node.operand, Ident) or len(node.operand.parts) > 2:
        return None
    q = node.query
    if q.ctes or q.order_by or q.limit is not None:
        return None
    sel = q.body
    if not isinstance(sel, SelectCore) or sel.distinct:
        return None
    if sel.group_by or sel.having:
        return None
    if len(sel.items) != 1 or sel.items[0].alias is not None:
        return None
    it = sel.items[0].expr
    if not (isinstance(it, Ident) and len(it.parts) == 1):
        return None
    if len(sel.from_) != 1:
        return None
    ref = sel.from_[0]
    if not isinstance(ref, TableRef) or ref.alias is not None:
        return None
    table, col = ref.name, it.parts[0]
    cols = columns_of(table)
    if cols is None or col not in {c.lower() for c in cols}:
        return None
    resolve = lambda p: _resolve_col(p, [table], columns_of)  # noqa: E731
    local = ""
    if sel.where is not None:
        if not _flat_local(sel.where, resolve):
            return None
        local = sel.where.text(text).strip()
    # the outer expr itself must not be a column of the channel table
    # written bare (that would be a correlated IN, different semantics)
    if (len(node.operand.parts) == 1
            and resolve(node.operand.parts) is not None):
        return None
    typ = types_of(table, col) if types_of else None
    if types_of and typ is None:
        return None
    return {
        "start": node.start, "end": node.end, "negative": False,
        "outer": ".".join(node.operand.parts),
        "outer_txt": node.operand.text(text),
        "key": col, "tables": table, "local": local, "type": typ,
    }


def _channel_tree(conj: Node, text: str, columns_of,
                  types_of) -> list[dict] | None:
    """If ``conj`` is composed ONLY of AND/OR/parens over channel
    leaves, return the channels in text order; else None."""
    chans: list[dict] = []

    def rec(n: Node) -> bool:
        if isinstance(n, Paren):
            return rec(n.inner)
        if isinstance(n, BinOp) and n.op in ("and", "or"):
            return rec(n.left) and rec(n.right)
        if isinstance(n, Exists):
            ch = _channel_from_exists(n, text, columns_of, types_of)
        elif isinstance(n, InSubquery):
            ch = _channel_from_in(n, text, columns_of, types_of)
        else:
            return False
        if ch is None:
            return False
        chans.append(ch)
        return True

    if not rec(conj):
        return None
    chans.sort(key=lambda c: c["start"])
    return chans


def channel_exists_to_union_flags(
    text: str,
    columns_of: Callable[[str], set[str] | None],
    types_of: Callable[[str, str], str | None] | None = None,
    min_count: int = 2,
) -> str | None:
    """Apply rule #2; returns rewritten SQL or None when it does not
    fire. ``types_of(table, col)`` returns the column's type string (or
    None when unknown) — REQUIRED so UNION ALL cannot silently coerce
    key types."""
    root = _parse(text)
    if root is None:
        return None

    regions: list[tuple[int, int, list[dict]]] = []
    for sel in root.selects():
        if sel.where is None:
            continue
        cj = conjuncts(sel.where)
        # annotate each conjunct: channel list or None
        runs: list[list[tuple[Node, list[dict]]]] = []
        cur: list[tuple[Node, list[dict]]] = []
        for c in cj:
            chans = _channel_tree(c, text, columns_of, types_of)
            if chans and (not cur
                          or cur[-1][1][0]["outer"] == chans[0]["outer"]):
                # all channels inside one conjunct must share the outer
                if len({x["outer"] for x in chans}) != 1:
                    if cur:
                        runs.append(cur)
                    cur = []
                    continue
                cur.append((c, chans))
            else:
                if cur:
                    runs.append(cur)
                cur = []
                if chans and len({x["outer"] for x in chans}) == 1:
                    cur = [(c, chans)]
        if cur:
            runs.append(cur)
        for run in runs:
            cl = [ch for _, chans in run for ch in chans]
            if len(cl) < min_count:
                continue
            if types_of is None or len({c["type"] for c in cl}) != 1:
                continue  # key types must be known and identical
            rs = run[0][0].start
            re_ = run[-1][0].end
            if has_comment(text, rs, re_):
                continue
            # NOT EXISTS present -> need a positive channel that is a
            # whole top-level conjunct of the region
            if any(c["negative"] for c in cl):
                anchored = any(
                    isinstance(c, (Exists, InSubquery))
                    and not getattr(c, "negated", False)
                    for c, _ in run
                )
                if not anchored:
                    continue
            regions.append((rs, re_, cl))

    if not regions:
        return None
    # build one CTE per region, substitute back to front
    ctes: list[str] = []
    out = text
    for n, (rs, re_, cl) in enumerate(sorted(regions, reverse=True)):
        idx = len(regions) - 1 - n
        cte = f"__chan_flags_{idx}"
        flag_cols = ", ".join(
            f"max(case when __ch = {k} then 1 end) __f{k}"
            for k in range(len(cl))
        )
        arms = []
        for k, c in enumerate(cl):
            w = f" where {c['local']}" if c["local"] else ""
            arms.append(
                f"select {c['key']} as __key, {k} as __ch"
                f" from {c['tables']}{w}"
            )
        ctes.append(
            f"{cte} as (select __key, {flag_cols}\n from ("
            + "\n union all ".join(arms)
            + ") u\n where __key is not null group by __key)"
        )
        # rebuild the region's boolean text with spans -> flag tests
        combo = []
        pos = rs
        for k, c in enumerate(cl):
            combo.append(text[pos:c["start"]])
            combo.append(
                f"__f{k} is null" if c["negative"] else f"__f{k} = 1"
            )
            pos = c["end"]
        combo.append(text[pos:re_])
        outer_txt = cl[0]["outer_txt"]
        repl = (f"{outer_txt} in (select __key from {cte} "
                f"where {''.join(combo)})")
        out = out[:rs] + repl + out[re_:]
    ctes.reverse()  # appended back-to-front; WITH reads forward
    cte_sql = ", ".join(ctes)
    m = re.match(r"^\s*with\b", out, re.I)
    if m:
        out = out[:m.end()] + " " + cte_sql + "," + out[m.end():]
    else:
        out = f"with {cte_sql}\n{out}"
    return out


# ======================================================================
# Rule #3 (r10): single-op set-operation chain -> union-agg flag pass
# ======================================================================
#
#   (select distinct a, b from t1, d where ...)
#   intersect (select a, b from t2, d where ...)
#   intersect (select a, b from t3, d where ...)
#       ==>
#   select a, b from (
#     select __c0, __c1, max(case when __ch=0 then 1 end) __f0, ...
#     from (select a as __c0, b as __c1, 0 as __ch from t1, d where ...
#           union all ...) u
#     group by __c0, __c1) f
#   where __f0 = 1 and __f1 = 1 and __f2 = 1
#
# Promoted from the q38/q87 hand rewrites (set-op collapse, r8 —
# measured -26%/-17% sf10). Why it is sound:
#   * INTERSECT / EXCEPT have DISTINCT-set semantics with NULLs
#     compared as equal — exactly GROUP BY's key semantics, so the
#     grouped union enumerates precisely the candidate tuples and the
#     per-arm max-flags encode membership.
#   * an all-INTERSECT chain is associativity-free (tuples in every
#     arm: all flags = 1); an all-EXCEPT chain is left-associative in
#     the standard (A minus B minus C: f0 = 1, others IS NULL). MIXED
#     chains are declined — SQL gives INTERSECT higher precedence than
#     EXCEPT, which the flag conjunction cannot express linearly.
#   * INTERSECT ALL / EXCEPT ALL (multiset) are declined outright.
#
# Why it matters at scale: the reference (and Catalyst) plans each arm
# as its own distinct-aggregate and chains set-op joins — N+N-1
# shuffles of the tuple; the rewrite is ONE shuffle of the unioned
# arms on the tuple key.
#
# Recognition gates: a maximal same-kind, non-ALL set-op tree whose
# parent is a plain query slot (no CTEs/ORDER BY/LIMIT attached);
# each arm is SELECT [DISTINCT] <plain cols with optional aliases>
# FROM <bare tables with optional aliases, schemas known>
# [WHERE <flat local conjuncts>]; equal column counts; per-position
# key types equal across arms (``types_of``).


def _parse_setop_arm(arm: Node, text: str, columns_of,
                     types_of) -> dict | None:
    """Validate one arm; returns dict or None. Unwraps a paren-wrapped
    Query arm first."""
    if isinstance(arm, Query):
        if arm.ctes or arm.order_by or arm.limit is not None:
            return None
        arm = arm.body
        if isinstance(arm, Query):  # doubly wrapped parens
            return _parse_setop_arm(arm, text, columns_of, types_of)
    if not isinstance(arm, SelectCore):
        return None
    if arm.group_by or arm.having:
        return None
    amap: dict[str, str] = {}
    for ref in arm.from_:
        if not isinstance(ref, TableRef):
            return None
        if columns_of(ref.name) is None:
            return None
        amap[ref.alias or ref.name] = ref.name
    if not amap:
        return None

    def resolve(parts: list[str]) -> tuple[str, str] | None:
        if len(parts) == 2:
            t = amap.get(parts[0])
            if t:
                cols = columns_of(t)
                if cols and parts[1] in {c.lower() for c in cols}:
                    return t, parts[1]
            return None
        if len(parts) == 1:
            for t in amap.values():
                cols = columns_of(t)
                if cols and parts[0] in {c.lower() for c in cols}:
                    return t, parts[0]
        return None

    cols: list[dict] = []
    for item in arm.items:
        e = item.expr
        if not isinstance(e, Ident) or len(e.parts) > 2:
            return None
        r = resolve(e.parts)
        if r is None:
            return None
        typ = types_of(r[0], r[1]) if types_of else None
        if types_of and typ is None:
            return None
        cols.append({
            "expr": e.text(text),
            "name": item.alias or e.parts[-1],
            "type": typ,
        })
    local = ""
    if arm.where is not None:
        if not _flat_local(arm.where,
                           lambda p: resolve(p) and resolve(p)[0]):
            return None
        local = arm.where.text(text).strip()
    return {
        "start": arm.start, "end": arm.end, "cols": cols,
        "tables": text[arm.from_[0].start:arm.from_[-1].end],
        "local": local,
    }


def setop_chain_to_union_flags(
    text: str,
    columns_of: Callable[[str], set[str] | None],
    types_of: Callable[[str, str], str | None] | None = None,
) -> str | None:
    """Apply rule #3; returns rewritten SQL or None. ``types_of`` is
    required (per-position key types must match across arms so the
    UNION cannot coerce)."""
    if types_of is None:
        return None
    root = _parse(text)
    if root is None:
        return None
    pm = parent_map(root)
    repl: list[tuple[int, int, str]] = []
    for node in root.walk():
        if not isinstance(node, SetOp):
            continue
        parent = pm.get(id(node))
        if isinstance(parent, SetOp):
            continue  # not the root of its chain
        # the chain must own its query slot outright — no ORDER BY /
        # LIMIT / CTEs attached to the enclosing Query (the replacement
        # is a plain SELECT; stay conservative, like the regex version)
        if not isinstance(parent, Query):
            continue
        if parent.ctes or parent.order_by or parent.limit is not None:
            continue
        kind = node.kind

        def flat(n: Node) -> list[Node] | None:
            if isinstance(n, SetOp):
                if n.kind != kind or n.all:
                    return None
                lt = flat(n.left)
                rt = flat(n.right)
                if lt is None or rt is None:
                    return None
                return lt + rt
            return [n]

        if kind not in ("intersect", "except"):
            continue
        arm_nodes = flat(node)
        if arm_nodes is None or len(arm_nodes) < 2:
            continue
        if has_comment(text, node.start, node.end):
            continue
        arms = []
        for a in arm_nodes:
            p = _parse_setop_arm(a, text, columns_of, types_of)
            if p is None:
                arms = None
                break
            arms.append(p)
        if not arms:
            continue
        ncol = len(arms[0]["cols"])
        if any(len(a["cols"]) != ncol for a in arms):
            continue
        if any(
            len({a["cols"][i]["type"] for a in arms}) != 1
            for i in range(ncol)
        ):
            continue
        keys = ", ".join(f"__c{i}" for i in range(ncol))
        tagged = []
        for k, a in enumerate(arms):
            sel = ", ".join(
                f"{c['expr']} as __c{i}" for i, c in enumerate(a["cols"])
            )
            w = f" where {a['local']}" if a["local"] else ""
            tagged.append(
                f"select {sel}, {k} as __ch from {a['tables']}{w}"
            )
        flags = ", ".join(
            f"max(case when __ch = {k} then 1 end) __f{k}"
            for k in range(len(arms))
        )
        test0 = "__f0 = 1"
        rest = " and ".join(
            f"__f{k} = 1" if kind == "intersect" else f"__f{k} is null"
            for k in range(1, len(arms))
        )
        names = ", ".join(
            f"__c{i} as {c['name']}" for i, c in enumerate(arms[0]["cols"])
        )
        repl.append((
            node.start, node.end,
            f"select {names} from (\n"
            f" select {keys}, {flags}\n from ("
            + "\n union all ".join(tagged)
            + f") u\n group by {keys}) f\n"
            f" where {test0}{' and ' + rest if rest else ''}",
        ))
    if not repl:
        return None
    out = text
    for s, e, r in sorted(repl, reverse=True):
        out = out[:s] + r + out[e:]
    return out


# ======================================================================
# Rule #4 (r10): self-EXISTS "another row with a different value"
#                -> group-wise min<>max semi filter
# ======================================================================
#
#   from T t1, ... where ...
#     and exists (select * from T t2
#                 where t1.k = t2.k and t1.w <> t2.w)
#       ==>
#   ... and (t1.w is not null and t1.k in
#            (select k from T where k is not null
#             group by k having min(w) <> max(w)))
#
# Promoted from the q16/q94 hand rewrites (r8: the TPC-H q21 shape —
# "the order has another row in a different warehouse"). Why it is
# sound (requires that the OUTER row is itself a row of T, which the
# gate proves by finding `T [as] t1` as a bare ref in the enclosing
# SelectCore's FROM — structural on the AST, so a `fact t1` inside a
# derived-table body can no longer satisfy it, ADVICE r10):
#   * E(x) = exists r in T with r.k = x.k and r.w <> x.w. For x.k or
#     x.w NULL, both comparisons fail: E = FALSE. The replacement then
#     reads FALSE/NULL — indistinguishable at the WHERE-conjunct
#     position the placement gate enforces (same argument as rule #2).
#   * For non-null x.k, x.w: x's own w is one of group k's non-null
#     values, so "exists a different non-null w" <=> the group has >= 2
#     distinct non-null w <=> min(w) <> max(w) (min/max ignore NULLs).
#   * `where k is not null` inside the subquery only drops groups no
#     non-null outer key can match.
#   Only POSITIVE exists is rewritten (NOT EXISTS would need 2-valued
#   IN, which NULL keys in the group list break).
#
# Why it matters at scale: Catalyst plans the correlated EXISTS as a
# LEFT SEMI join of the FULL fact against itself with the `<>` as a
# post-match residual — a fact-by-fact sort/shuffle whose matches are
# discarded. The rewrite is one partial-aggregatable group pass (map-
# side combine on k) + a semi join against the (small) multi-value key
# set. Reference analog: the SEMI_JOIN_RULES decorrelation
# (FlinkStreamRuleSets.scala:34) keeps the self-join; ours removes it.
#
# Gates: subquery = SELECT */1 FROM T [AS] t2 WHERE exactly two
# conjuncts — one equality, one inequality (<> or !=), each comparing
# t2.<col> against <outer_alias>.<SAME col>; one shared outer alias;
# T's schema known and both columns in it; `T [AS] <outer_alias>`
# present as a bare ref in the FROM of the SelectCore whose WHERE
# holds the EXISTS as a top-level conjunct; positive placement only.


def self_exists_distinct_to_groupwise(
    text: str,
    columns_of: Callable[[str], set[str] | None],
) -> str | None:
    """Apply rule #4; returns rewritten SQL or None."""
    root = _parse(text)
    if root is None:
        return None
    repl: list[tuple[int, int, str]] = []
    for sel in root.selects():
        if sel.where is None:
            continue
        from_tables = sel.from_tables()
        for conj in conjuncts(sel.where):
            if not isinstance(conj, Exists) or conj.negated:
                continue
            q = conj.query
            if q.ctes or q.order_by or q.limit is not None:
                continue
            inner = q.body
            if not isinstance(inner, SelectCore) or inner.distinct:
                continue
            if inner.group_by or inner.having or inner.where is None:
                continue
            if len(inner.items) != 1 or inner.items[0].alias is not None:
                continue
            it = inner.items[0].expr
            if not (isinstance(it, Star)
                    or (isinstance(it, Literal) and it.val == "1")):
                continue
            if len(inner.from_) != 1:
                continue
            ref = inner.from_[0]
            if not isinstance(ref, TableRef):
                continue
            table = ref.name
            t2 = ref.alias or table
            cols = columns_of(table)
            if cols is None:
                continue
            cols = {c.lower() for c in cols}
            cjs = conjuncts(inner.where)
            if len(cjs) != 2:
                continue
            eq = ineq = None
            outer_alias = None
            ok = True
            for cmp_ in cjs:
                if not (isinstance(cmp_, BinOp)
                        and cmp_.op in ("=", "<>")
                        and isinstance(cmp_.left, Ident)
                        and isinstance(cmp_.right, Ident)
                        and len(cmp_.left.parts) == 2
                        and len(cmp_.right.parts) == 2):
                    ok = False
                    break
                (a_al, a_col) = cmp_.left.parts
                (b_al, b_col) = cmp_.right.parts
                if a_col != b_col or a_col not in cols:
                    ok = False
                    break
                aliases = {a_al, b_al}
                if t2 not in aliases or len(aliases) != 2:
                    ok = False
                    break
                other = (aliases - {t2}).pop()
                if outer_alias is None:
                    outer_alias = other
                elif outer_alias != other:
                    ok = False
                    break
                if cmp_.op == "=":
                    if eq is not None:
                        ok = False
                        break
                    eq = a_col
                else:
                    if ineq is not None:
                        ok = False
                        break
                    ineq = a_col
            if not (ok and eq and ineq and outer_alias):
                continue
            # the outer alias must be a bare ref of THE SAME TABLE in
            # the FROM of the SelectCore that owns this WHERE
            if from_tables.get(outer_alias) != table:
                continue
            if has_comment(text, conj.start, conj.end):
                continue
            repl.append((
                conj.start, conj.end,
                f"({outer_alias}.{ineq} is not null and"
                f" {outer_alias}.{eq} in "
                f"(select {eq} from {table} where {eq} is not null "
                f"group by {eq} having min({ineq}) <> max({ineq})))",
            ))
    if not repl:
        return None
    out = text
    for s, e, r in sorted(repl, reverse=True):
        out = out[:s] + r + out[e:]
    return out


# ======================================================================
# Rule #5 (r11): pre-aggregate before a ROLLUP Expand
# ======================================================================
#
#   select k1, k2, sum(x), avg(y), count(*) from f, d where p
#   group by rollup(k1, k2)
#       ==>
#   with __rollup_base_0 as (
#     select k1, k2, sum(x) __p0, sum(y) __p1s, count(y) __p1c,
#            count(*) __p2
#     from f, d where p group by k1, k2)
#   select k1, k2, cast(sum(__p0) as T_sum), cast(sum(__p1s)/sum(__p1c)
#          as T_avg), cast(sum(__p2) as bigint)
#   from __rollup_base_0 group by rollup(k1, k2)
#
# Promoted from the q67 (r8) / q36/q70/q86/q22 (r9) hand rewrites —
# VERDICT r10 task #5. ROLLUP/CUBE plan through an Expand that
# duplicates EVERY input row once per grouping set; grouping FIRST on
# the base keys runs the Expand over |groups| (bounded by the dimension
# domain) instead of |rows| (grows with data volume) — at 100 TB the
# difference between re-shuffling the fact k times and re-shuffling a
# dimension-bounded aggregate. The reference's planner does this as
# DecomposeGroupingSetsRule + partial aggregate pushdown
# (FlinkStreamRuleSets.scala:280); Catalyst does not, so the engine
# rewrites the SQL. Measured on the hand family at sf10: q36 -30%,
# q70 -37%, q86 -15%, q22 -10%, q67 -51%.
#
# Why it is sound (the r9-proven decompositions):
#   * GROUP BY and ROLLUP share null-safe key equality, so the base
#     groups partition exactly the rows each rollup cell aggregates;
#     re-aggregating partials per cell is the standard partial/final
#     split: sum = sum of sums, count = sum of counts, min/max =
#     min/max of min/maxs, avg = sum of sums / sum of counts.
#   * Empty-input cells cannot arise (every base row exists); per-group
#     all-NULL inputs yield NULL partials which the outer sum/min/max
#     ignore — matching the verbatim aggregate over the same rows.
#   * Result TYPES are restored by casting each outer re-aggregate to
#     the verbatim aggregate's Spark type (sum over decimal(p,s) =
#     decimal(p+10,s); avg = decimal(p+4,s+4); sum over integral =
#     bigint; count = bigint) — the q28-proven trick, so the rewritten
#     schema is indistinguishable.
#   * grouping(key) and rank() OVER read the OUTER rollup's grouping
#     state, which is untouched; aggregate calls inside window specs
#     are span-replaced like any other call site.
#
# Recognition gates (decline on any doubt):
#   * exactly one grouping element, kind ROLLUP, all keys bare
#     single-part identifiers resolving to the FROM tables;
#   * FROM is bare tables (aliases fine, schemas known), no HAVING,
#     no DISTINCT, WHERE (if any) flat-local so it lifts verbatim
#     into the base CTE (a subquery/function there → decline — this
#     keeps the rule off TPC-DS q18, the family's measured LOSS, and
#     off q5/q77/q80 whose rollups sit over derived tables);
#   * every aggregate is SUM/COUNT/MIN/MAX/AVG, non-DISTINCT, with a
#     liftable argument; SUM/AVG args must have a resolvable numeric
#     type (bare column via ``types_of``, or CAST(.. AS numeric));
#   * outside aggregate arguments, expressions may reference only
#     rollup keys, item aliases (ORDER BY), GROUPING(key), literals,
#     and window specs built from the same.

_ROLLUP_AGGS = {"sum", "count", "min", "max", "avg"}


def _num_type(type_str: str | None):
    """Normalize a type string (Arrow ``decimal128(7, 2)`` / Spark
    ``decimal(7,2)`` / ``int64`` / ``bigint`` ...) to ("decimal", p, s)
    | ("int",) | ("double",) | None."""
    if not type_str:
        return None
    t = type_str.strip().lower()
    m = re.match(r"decimal(?:128|256)?\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
    if m:
        return ("decimal", int(m.group(1)), int(m.group(2)))
    if t in ("int8", "int16", "int32", "int64", "uint8", "uint16",
             "uint32", "uint64", "tinyint", "smallint", "int",
             "integer", "bigint", "long", "short", "byte"):
        return ("int",)
    if t in ("float", "double", "float32", "float64", "real", "halffloat"):
        return ("double",)
    return None


def _sum_result_type(nt) -> str | None:
    if nt is None:
        return None
    if nt[0] == "decimal":
        return f"decimal({min(38, nt[1] + 10)},{nt[2]})"
    if nt[0] == "int":
        return "bigint"
    return "double"


def _avg_result_type(nt) -> str | None:
    if nt is None:
        return None
    if nt[0] == "decimal":
        return f"decimal({min(38, nt[1] + 4)},{min(38, nt[2] + 4)})"
    return "double"


def _agg_arg_type(arg, resolve_type) -> str | None:
    """Type of a SUM/AVG argument: a bare column (via the caller's
    types_of) or a CAST target; None when underivable."""
    from flink_spark.sqlast import Cast as _Cast

    if isinstance(arg, Ident):
        return resolve_type(arg.parts)
    if isinstance(arg, _Cast):
        return arg.type_text
    return None


def preagg_before_rollup(
    text: str,
    columns_of: Callable[[str], set[str] | None],
    types_of: Callable[[str, str], str | None] | None = None,
) -> str | None:
    """Apply rule #5; returns rewritten SQL or None. ``types_of`` is
    required (SUM/AVG result types cannot be restored without the
    argument's type)."""
    from flink_spark.sqlast import Cast as _Cast
    from flink_spark.sqlast import OrderItem as _OrderItem
    from flink_spark.sqlast import _children

    if types_of is None:
        return None
    root = _parse(text)
    if root is None:
        return None
    pm = parent_map(root)

    edits: list[tuple[int, int, str]] = []
    ctes: list[str] = []
    for sel in root.selects():
        if sel.distinct or sel.having is not None:
            continue
        if len(sel.group_by) != 1 or sel.group_by[0].kind != "rollup":
            continue
        keys_nodes = sel.group_by[0].exprs
        if not keys_nodes or not all(
            isinstance(k, Ident) and len(k.parts) == 1
            for k in keys_nodes
        ):
            continue
        keys = [k.parts[0] for k in keys_nodes]
        amap: dict[str, str] = {}
        ok = bool(sel.from_)
        for ref in sel.from_:
            if not isinstance(ref, TableRef) or columns_of(ref.name) is None:
                ok = False
                break
            amap[ref.alias or ref.name] = ref.name
        if not ok:
            continue

        def resolve(parts: list[str]) -> str | None:
            if len(parts) == 2:
                t = amap.get(parts[0])
                if t:
                    cols = columns_of(t)
                    if cols and parts[1] in {c.lower() for c in cols}:
                        return t
                return None
            if len(parts) == 1:
                for t in amap.values():
                    cols = columns_of(t)
                    if cols and parts[0] in {c.lower() for c in cols}:
                        return t
            return None

        def resolve_type(parts: list[str]) -> str | None:
            t = resolve(parts)
            return types_of(t, parts[-1]) if t else None

        if not all(resolve([k]) for k in keys):
            continue
        if sel.where is not None and not _flat_local(sel.where, resolve):
            continue

        # --- collect aggregate call sites; validate everything else ---
        aggs: list[dict] = []
        item_aliases = {i.alias for i in sel.items if i.alias}

        def lift_ok(node) -> bool:
            """Argument safe to lift verbatim into the base CTE."""
            for n in node.walk():
                if isinstance(n, _Cast):
                    continue
                if isinstance(n, Star):
                    continue
                if not isinstance(n, _FLAT_OK):
                    return False
                if isinstance(n, Ident) and resolve(n.parts) is None:
                    return False
            return True

        def visit(node, allow_alias: bool) -> bool:
            if isinstance(node, FuncCall):
                if (node.name in _ROLLUP_AGGS and node.over is None
                        and not node.distinct):
                    if node.star:
                        if node.name != "count":
                            return False
                        arg_txt = "*"
                        arg = None
                    elif len(node.args) == 1 and lift_ok(node.args[0]):
                        arg = node.args[0]
                        arg_txt = arg.text(text)
                    else:
                        return False
                    if node.name in ("sum", "avg"):
                        nt = _num_type(_agg_arg_type(arg, resolve_type))
                        if nt is None:
                            return False
                        rt = (_sum_result_type(nt) if node.name == "sum"
                              else _avg_result_type(nt))
                    else:
                        rt = None
                    aggs.append({
                        "start": node.start, "end": node.end,
                        "name": node.name, "arg": arg_txt, "type": rt,
                    })
                    return True
                if node.name == "grouping":
                    return all(
                        isinstance(a, Ident) and len(a.parts) == 1
                        and a.parts[0] in keys for a in node.args
                    )
                if node.distinct or node.star:
                    return False
                kids_ok = all(visit(a, allow_alias) for a in node.args)
                if node.over is not None:
                    kids_ok = kids_ok and all(
                        visit(p, allow_alias)
                        for p in node.over.partition_by
                    ) and all(
                        visit(o, allow_alias) for o in node.over.order_by
                    )
                return kids_ok
            if isinstance(node, _OrderItem):
                return visit(node.expr, allow_alias)
            if isinstance(node, Ident):
                if len(node.parts) != 1:
                    return False
                return (node.parts[0] in keys
                        or (allow_alias and node.parts[0] in item_aliases))
            if isinstance(node, Literal):
                return True
            if isinstance(node, (BinOp, UnaryOp, Paren, IsNull, Between,
                                 Case, _Cast, InList)):
                return all(visit(c, allow_alias) for c in _children(node))
            return False

        if not all(visit(i.expr, False) for i in sel.items):
            continue
        parent = pm.get(id(sel))
        order_items = (parent.order_by
                       if isinstance(parent, Query) else [])
        if not all(visit(o, True) for o in order_items):
            continue
        if not aggs:
            continue
        if has_comment(text, sel.start,
                       order_items[-1].end if order_items else sel.end):
            continue

        # --- emission ---
        idx = len(ctes)
        cte = f"__rollup_base_{idx}"
        partials: dict[tuple[str, str], dict] = {}
        local_edits: list[tuple[int, int, str]] = []
        for a in aggs:
            pk = (a["name"], re.sub(r"\s+", " ", a["arg"]))
            if pk not in partials:
                k = len(partials)
                if a["name"] == "avg":
                    base = (f"sum({a['arg']}) __p{k}s, "
                            f"count({a['arg']}) __p{k}c")
                    outer = (f"cast(sum(__p{k}s)/sum(__p{k}c)"
                             f" as {a['type']})")
                elif a["name"] == "sum":
                    base = f"sum({a['arg']}) __p{k}"
                    outer = f"cast(sum(__p{k}) as {a['type']})"
                elif a["name"] == "count":
                    base = f"count({a['arg']}) __p{k}"
                    outer = f"cast(sum(__p{k}) as bigint)"
                else:  # min / max
                    base = f"{a['name']}({a['arg']}) __p{k}"
                    outer = f"{a['name']}(__p{k})"
                partials[pk] = {"base": base, "outer": outer}
            local_edits.append(
                (a["start"], a["end"], partials[pk]["outer"])
            )
        base_cols = ", ".join(p["base"] for p in partials.values())
        from_txt = text[sel.from_[0].start:sel.from_[-1].end]
        w = (f" where {sel.where.text(text).strip()}"
             if sel.where is not None else "")
        ctes.append(
            f"{cte} as (select {', '.join(keys)}, {base_cols}\n"
            f" from {from_txt}{w}\n group by {', '.join(keys)})"
        )
        # swap the FROM (+WHERE) for the base CTE
        fw_end = (sel.where.end if sel.where is not None
                  else sel.from_[-1].end)
        local_edits.append((sel.from_[0].start, fw_end, cte))
        edits.extend(local_edits)

    if not ctes:
        return None
    out = text
    for s, e, r in sorted(edits, reverse=True):
        out = out[:s] + r + out[e:]
    cte_sql = ", ".join(ctes)
    m = re.match(r"^\s*with\b", out, re.I)
    if m:
        out = out[:m.end()] + " " + cte_sql + "," + out[m.end():]
    else:
        out = f"with {cte_sql}\n{out}"
    return out
