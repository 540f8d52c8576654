"""DataStream-compat layer: rolling keyed aggregates must reproduce
Flink's per-record emission; connect/side-output/partitioning wrappers
must preserve rows."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_spark.datastream import StreamExecutionEnvironment

ROWS = [
    ("u1", 1, 10.0),
    ("u1", 2, 5.0),
    ("u1", 3, 20.0),
    ("u2", 1, 7.0),
    ("u2", 2, 3.0),
]
SCHEMA = "user string, seq int, v double"


@pytest.fixture(scope="module")
def env(spark):
    return StreamExecutionEnvironment.get_execution_environment(spark)


@pytest.fixture(scope="module")
def ds(env):
    return env.from_collection(ROWS, SCHEMA)


def test_map_expr_and_filter(ds):
    got = (
        ds.map(["user", "v * 2 as v2"]).filter("v2 > 10").execute_and_collect()
    )
    assert sorted((r.user, r.v2) for r in got) == [("u1", 20.0), ("u1", 40.0), ("u2", 14.0)]


def test_map_python_callable_arrow_batch(ds):
    got = ds.map(
        lambda pdf: pdf.assign(tag=pdf.user.str.upper()),
        output_type="user string, seq int, v double, tag string",
    ).execute_and_collect()
    assert {r.tag for r in got} == {"U1", "U2"}


def test_flat_map_explode(env):
    ds = env.from_collection([("a b",), ("c",)], "line string")
    got = ds.flat_map("split(line, ' ')").execute_and_collect()
    assert sorted(r.value for r in got) == ["a", "b", "c"]


def test_rolling_sum_per_record_emission(ds):
    got = ds.key_by("user").sum("v", order_col="seq").execute_and_collect()
    u1 = sorted((r.seq, r.sum_v) for r in got if r.user == "u1")
    assert u1 == [(1, 10.0), (2, 15.0), (3, 35.0)]


def test_rolling_min_by_keeps_record(ds):
    got = ds.key_by("user").min_by("v", order_col="seq").execute_and_collect()
    # after seq=3 for u1 the running-min record is still seq=2 (v=5)
    u1 = [(r.seq, r.v) for r in got if r.user == "u1"]
    assert (2, 5.0) in u1 and u1.count((2, 5.0)) == 2  # held at seq 2 and 3


def test_keyed_reduce_arbitrary_fn(ds):
    def plus(acc, row):
        acc = acc.copy()
        acc["v"] = acc["v"] + row["v"]
        acc["seq"] = row["seq"]
        return acc

    got = ds.key_by("user").reduce(plus, order_col="seq").execute_and_collect()
    final = {r.user: r.v for r in got if r.seq == max(x.seq for x in got if x.user == r.user)}
    assert final == {"u1": 35.0, "u2": 10.0}


def test_connect_co_map(env, ds):
    other = env.from_collection([("u9", 99)], "name string, n int")
    got = ds.connect(other).co_map(
        ["user as id", "v as val"], ["name as id", "cast(n as double) as val"]
    ).execute_and_collect()
    assert ("u9", 99.0, "right") in {(r.id, r.val, r._origin) for r in got}
    assert len(got) == 6


def test_side_outputs_single_pass(ds):
    main, sides = ds.split_by_tags(
        {"big": "v >= 10", "tiny": "v < 5"}, keep_main="v >= 5 and v < 10"
    )
    assert sorted(r.v for r in sides["big"].execute_and_collect()) == [10.0, 20.0]
    assert sorted(r.v for r in sides["tiny"].execute_and_collect()) == [3.0]
    assert sorted(r.v for r in main.execute_and_collect()) == [5.0, 7.0]


def test_partitioning_ops(ds):
    assert ds.shuffle(4).df.rdd.getNumPartitions() == 4
    assert ds.global_().df.rdd.getNumPartitions() == 1
    assert ds.partition_custom("user").df.rdd.getNumPartitions() > 0
    assert ds.project(0, 2).df.columns == ["user", "v"]


def test_keyed_process_function(ds):
    def spread(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user": [key[0]], "spread": [pdf.v.max() - pdf.v.min()]}
        )

    got = ds.key_by("user").process(spread, "user string, spread double").execute_and_collect()
    assert {(r.user, r.spread) for r in got} == {("u1", 15.0), ("u2", 4.0)}


def test_windowed_keyed_agg(env):
    rows = [("u1", "2024-01-01 00:10:00", 1.0), ("u1", "2024-01-01 00:50:00", 2.0),
            ("u1", "2024-01-01 01:10:00", 4.0)]
    ds = env.from_collection(rows, "user string, ts_s string, v double").map(
        ["user", "cast(ts_s as timestamp) as ts", "v"]
    )
    got = (
        ds.key_by("user")
        .window_tumble("ts", "1 hour")
        .agg(F.sum("v").alias("total"))
        .orderBy("window.start")
        .collect()
    )
    assert [r.total for r in got] == [3.0, 4.0]


def test_union_and_broadcast(env, ds):
    extra = env.from_collection([("u3", 1, 1.0)], SCHEMA)
    assert ds.union(extra).df.count() == 6
    assert ds.broadcast().df.count() == 5  # hint preserves rows


def test_windowed_cogroup_delivers_both_bags(env):
    """CoGroupedStreams.java contract: fn sees the full left and right
    bags per (window, key) — including windows where one side is empty
    (which a join would drop)."""
    import pandas as pd

    left = env.from_collection(
        [("u1", "2024-01-01 00:10:00", 1.0),
         ("u1", "2024-01-01 00:20:00", 2.0),
         ("u2", "2024-01-01 00:30:00", 5.0)],
        "user string, ts_s string, v double",
    ).map(["user", "cast(ts_s as timestamp) as ts", "v"])
    right = env.from_collection(
        [("u1", "2024-01-01 00:15:00", 10.0),
         ("u3", "2024-01-01 00:40:00", 30.0)],
        "user string, ts_s string, w double",
    ).map(["user", "cast(ts_s as timestamp) as ts", "w"])

    def summarize(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        user = lpdf.user.iloc[0] if len(lpdf) else rpdf.user.iloc[0]
        return pd.DataFrame(
            [[user, len(lpdf), len(rpdf),
              float(lpdf.v.sum()) + float(rpdf.w.sum() if len(rpdf) else 0.0)]],
            columns=["user", "nl", "nr", "total"],
        )

    got = left.co_group(
        right, key="user", ts_col="ts", window_size="1 hour",
        fn=summarize, output_type="user string, nl long, nr long, total double",
    ).execute_and_collect()
    by_user = {r.user: (r.nl, r.nr, r.total) for r in got}
    assert by_user["u1"] == (2, 1, 13.0)
    assert by_user["u2"] == (1, 0, 5.0)   # right bag empty
    assert by_user["u3"] == (0, 1, 30.0)  # left bag empty


def test_broadcast_state_pattern(env):
    """Broadcast state pattern (BroadcastConnectedStream +
    BroadcastProcessFunction): a small rules stream is replicated to
    every main-stream task; each element is processed against the full
    read-only rules snapshot."""
    import pandas as pd

    main = env.from_collection(
        [("a", 5.0), ("b", 50.0), ("c", 500.0)], "cat string, v double"
    )
    rules = env.from_collection(
        [("a", 10.0), ("b", 10.0)], "cat string, threshold double"
    )

    def apply_rules(pdf: pd.DataFrame, state: list) -> pd.DataFrame:
        th = {r["cat"]: r["threshold"] for r in state}
        out = pdf.copy()
        out["flagged"] = [
            bool(v > th.get(c, float("inf")))
            for c, v in zip(pdf.cat, pdf.v)
        ]
        return out

    got = (
        main.connect_broadcast(rules)
        .process(apply_rules, "cat string, v double, flagged boolean")
        .execute_and_collect()
    )
    by_cat = {r.cat: r.flagged for r in got}
    # b exceeds its rule; a does not; c has no rule -> not flagged
    assert by_cat == {"a": False, "b": True, "c": False}


def test_keyed_window_apply(env):
    """WindowedStream.apply / ProcessWindowFunction: the whole (key,
    window) row bag reaches the user function, which emits an arbitrary
    summary row (here: count + min/max spread) — strictly more general
    than an aggregate."""
    import pandas as pd

    ds = env.from_collection(
        [("u1", "2024-01-01 00:10:00", 1.0),
         ("u1", "2024-01-01 00:50:00", 9.0),
         ("u1", "2024-01-01 01:10:00", 4.0),
         ("u2", "2024-01-01 00:20:00", 7.0)],
        "user string, ts_s string, v double",
    ).map(["user", "cast(ts_s as timestamp) as ts", "v"])

    def spread(key, pdf: pd.DataFrame) -> pd.DataFrame:
        user, w_start = key
        return pd.DataFrame(
            [[user, str(w_start), len(pdf), float(pdf.v.max() - pdf.v.min())]],
            columns=["user", "w", "n", "spread"],
        )

    got = (
        ds.key_by("user")
        .window_apply("ts", "1 hour", spread,
                      "user string, w string, n long, spread double")
        .execute_and_collect()
    )
    rows = {(r.user, r.w[:19]): (r.n, r.spread) for r in got}
    assert rows[("u1", "2024-01-01 00:00:00")] == (2, 8.0)
    assert rows[("u1", "2024-01-01 01:00:00")] == (1, 0.0)
    assert rows[("u2", "2024-01-01 00:00:00")] == (1, 0.0)


def test_sink_surface_write_to_socket(env):
    """writeToSocket (DataStream.java:1118): every partition streams
    its rows to the host:port through the serializer — verified with a
    local TCP server; rows arrive complete, no driver collect."""
    import socket
    import threading

    received = []
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.listen(8)
    stop = threading.Event()

    def serve():
        srv.settimeout(10)
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                return
            with conn:
                buf = b""
                while True:
                    chunk = conn.recv(4096)
                    if not chunk:
                        break
                    buf += chunk
                received.append(buf)

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    ds = env.from_collection(
        [(i, f"r{i}") for i in range(10)], "id int, name string"
    )
    ds.write_to_socket("127.0.0.1", port)
    stop.set()
    # poke the accept loop loose
    try:
        socket.create_connection(("127.0.0.1", port), timeout=2).close()
    except OSError:
        pass
    t.join(timeout=10)
    srv.close()
    lines = b"".join(received).decode().strip().splitlines()
    got = {ln for ln in lines if ln}
    assert {f"{i},r{i}" for i in range(10)} <= got


def test_sink_surface_output_format_and_add_sink(env, tmp_path):
    """writeUsingOutputFormat's open/writeRecord/close lifecycle and
    addSink's per-record invoke, both executor-side (files written from
    the workers, nothing collected)."""
    import os

    out1 = tmp_path / "fmt"
    out1.mkdir()
    p1 = str(out1)

    def open_fn():
        import os as _os
        import uuid

        return open(f"{p1}/{_os.getpid()}_{uuid.uuid4().hex}.txt", "w")

    def write_fn(f, row):
        f.write(f"{row[0]}|{row[1]}\n")

    def close_fn(f):
        f.close()

    ds = env.from_collection(
        [(i, i * 2) for i in range(8)], "a int, b int"
    )
    ds.write_using_output_format(open_fn, write_fn, close_fn)
    lines = set()
    for f in os.listdir(p1):
        lines |= set(open(os.path.join(p1, f)).read().splitlines())
    assert lines == {f"{i}|{i * 2}" for i in range(8)}

    out2 = tmp_path / "sink"
    out2.mkdir()
    p2 = str(out2)

    def invoke(row):
        with open(f"{p2}/row_{row[0]}", "w") as f:
            f.write(str(row[1]))

    ds.add_sink(invoke)
    got = {(f, open(os.path.join(p2, f)).read()) for f in os.listdir(p2)}
    assert got == {(f"row_{i}", str(i * 2)) for i in range(8)}


def test_sink_surface_text_csv_and_print(env, tmp_path, capsys):
    """writeAsText/writeAsCsv WriteMode overloads + print/printToErr
    with a sink identifier (DataStream.java:934-1093)."""
    ds = env.from_collection(
        [(1, "a"), (2, "b")], "id int, s string"
    )
    tdir = str(tmp_path / "txt")
    ds.write_as_text(tdir)
    import pytest as _pytest

    with _pytest.raises(Exception):
        ds.write_as_text(tdir)  # NO_OVERWRITE default
    ds.write_as_text(tdir, write_mode="overwrite")  # WriteMode.OVERWRITE
    cdir = str(tmp_path / "csv")
    ds.write_as_csv(cdir, sep="|")
    spark = ds.df.sparkSession
    back = spark.read.options(sep="|", header="true").csv(
        cdir, schema="id int, s string"
    )
    assert {(r.id, r.s) for r in back.collect()} == {(1, "a"), (2, "b")}
    ds.print(sink_identifier="my-sink")
    out = capsys.readouterr()
    assert "== my-sink ==" in out.out
    ds.print_to_err(sink_identifier="err-sink")
    err = capsys.readouterr()
    assert "== err-sink ==" in err.err
