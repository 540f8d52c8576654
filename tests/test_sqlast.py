"""flink_spark/sqlast.py — the rewrite-rule substrate (r11, VERDICT
r10 task #4). The parser's contract: parse-or-raise (rules decline on
ParseError), spans index the ORIGINAL text exactly, and the grammar
covers every query text the engine itself executes — all 103 verbatim
TPC-DS texts plus the engine's own full-text rewrites."""

import os

import pytest

from flink_spark.sqlast import (
    Between,
    BinOp,
    Case,
    Exists,
    FuncCall,
    Ident,
    InList,
    InSubquery,
    IsNull,
    Literal,
    ParseError,
    Query,
    ScalarSubquery,
    SelectCore,
    SetOp,
    TableRef,
    conjuncts,
    has_comment,
    parent_map,
    parse,
    tokenize,
)


def test_tokenizer_basics():
    toks = tokenize("select a.b, 'it''s', 1.5e3 -- c\n /*x*/ <> from t")
    kinds = [(t.kind, t.val) for t in toks]
    assert ("kw", "select") in kinds
    assert ("str", "'it''s'") in kinds
    assert ("num", "1.5e3") in kinds
    assert ("op", "<>") in kinds
    # comments vanish; idents lowercase
    assert all("c" != v for k, v in kinds if k == "ident")
    assert kinds[-1] == ("eof", "")


def test_parse_structure_and_spans():
    sql = ("with x as (select k, sum(v) s from t group by k) "
           "select a.k, s from x a left join u on a.k = u.k "
           "where s > 10 and a.k in (1, 2) "
           "order by s desc nulls last limit 5")
    q = parse(sql)
    assert len(q.ctes) == 1 and q.ctes[0].name == "x"
    assert q.limit is not None and q.order_by[0].dir == "desc"
    sel = q.body
    assert isinstance(sel, SelectCore)
    cs = conjuncts(sel.where)
    assert len(cs) == 2
    assert isinstance(cs[0], BinOp) and isinstance(cs[1], InList)
    # every node's span round-trips
    for node in q.walk():
        assert sql[node.start:node.end] == node.text(sql)


def test_parse_expressions():
    sql = ("select case when a between 1 and 2 then 'x' else b || 'y' end,"
           " cast(c as decimal(7,2)), count(distinct d),"
           " rank() over (partition by e order by f rows between"
           " unbounded preceding and current row),"
           " not (g is not null), date '2000-01-01', interval 30 days"
           " from t where exists (select 1 from u where u.k = t.k)"
           " and h not in (select m from v)")
    q = parse(sql)
    sel = q.body
    kinds = [type(i.expr).__name__ for i in sel.items]
    assert kinds[0] == "Case" and kinds[1] == "Cast"
    fc = sel.items[2].expr
    assert isinstance(fc, FuncCall) and fc.distinct
    rk = sel.items[3].expr
    assert isinstance(rk, FuncCall) and rk.over is not None
    assert rk.over.frame_text.startswith("rows between")
    cs = conjuncts(sel.where)
    assert isinstance(cs[0], Exists) and not cs[0].negated
    assert isinstance(cs[1], InSubquery) and cs[1].negated


def test_parse_setops_and_parens():
    q = parse("(select a from t1) intersect select a from t2"
              " intersect (select a from t3)")
    assert isinstance(q.body, SetOp)
    # left-assoc chain of one kind
    assert q.body.kind == "intersect" and q.body.left.kind == "intersect"


def test_precedence():
    q = parse("select * from t where a = 1 or b = 2 and c = 3")
    w = q.body.where
    assert isinstance(w, BinOp) and w.op == "or"   # AND binds tighter
    assert isinstance(w.right, BinOp) and w.right.op == "and"
    q2 = parse("select * from t where not a = 1 and b = 2")
    cs = conjuncts(q2.body.where)
    assert len(cs) == 2  # NOT binds tighter than AND


def test_parse_errors():
    for bad in ("select", "select * from", "select * from t where",
                "select (a from t", "select * frm t"):
        with pytest.raises(ParseError):
            parse(bad)


def test_parent_map_and_helpers():
    sql = "select * from t where (select max(x) from u where p > 0) > 5"
    q = parse(sql)
    pm = parent_map(q)
    subs = [n for n in q.walk() if isinstance(n, ScalarSubquery)]
    assert len(subs) == 1
    par = pm[id(subs[0])]
    assert isinstance(par, BinOp) and par.op == ">"
    assert not has_comment(sql, 0, len(sql))
    assert has_comment("a -- x\nb", 0, 8)
    assert not has_comment("a '--' b", 0, 8)  # comment inside literal


def test_from_tables_skips_derived_bodies():
    q = parse("select t1.k from (select k from fact t1) t1, dim d "
              "where t1.k = d.k")
    sel = next(iter(q.selects()))
    ft = sel.from_tables()
    # the derived alias maps to '' (not to fact); dim is a bare ref
    assert ft["t1"] == "" and ft["d"] == "dim"


def _tpcds_texts():
    os.environ.setdefault("SPARK_GRAFT_TPCDS_DIR",
                          "/root/repo/benchdata/tpcds")
    from flink_spark.queries_tpcds_real import (
        _SPARK_FULL_REWRITE,
        _TPCDS_REAL,
    )

    for qid, (text, *_rest) in sorted(_TPCDS_REAL.items()):
        yield f"q{qid}", text
    for qid, text in sorted(_SPARK_FULL_REWRITE.items()):
        yield f"rw{qid}", text


def test_all_tpcds_texts_parse_with_exact_spans():
    """The substrate must cover the engine's own corpus: all 103
    verbatim texts + all full-text rewrites parse, and every produced
    node's span round-trips through the source."""
    n_texts = n_nodes = 0
    for label, text in _tpcds_texts():
        q = parse(text)
        n_texts += 1
        for node in q.walk():
            n_nodes += 1
            assert 0 <= node.start <= node.end <= len(text), (
                label, type(node).__name__, node.start, node.end,
            )
    # 103 verbatim + every live full-text hand rewrite (the floor moves
    # down as hand rewrites retire through the rule library — q69 r11)
    assert n_texts >= 125 and n_nodes > 15000


def test_case_when_children_walked():
    q = parse("select case when a = 1 then b else c end from t")
    idents = {".".join(i.parts) for i in q.walk() if isinstance(i, Ident)}
    assert {"a", "b", "c"} <= idents
    case = next(n for n in q.walk() if isinstance(n, Case))
    pm = parent_map(q)
    cond = case.whens[0][0]
    assert pm[id(cond)] is case
