"""End-to-end HTTP tests, porting the reference API contract
(/root/reference/test/test_api.py): store→query round trips in all
CSV/JSON combos, pagination header, type hints, stand-in columns,
updates, eviction, statistics, error codes."""
from __future__ import annotations

import gzip
import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from qcache_spark.server import make_server, serve_forever_in_thread

CSV_BODY = "foo,bar\n1,10\n2,20\n3,30\n"


@pytest.fixture(scope="module")
def server(spark):
    srv = make_server(spark, max_cache_size=1 << 30)
    serve_forever_in_thread(srv)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def call(base, method, path, body=None, headers=None):
    req = urllib.request.Request(
        base + path, data=body, method=method, headers=headers or {}
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


def store(base, key, body=CSV_BODY, ctype="text/csv", headers=None):
    h = {"Content-Type": ctype}
    h.update(headers or {})
    return call(base, "POST", f"/qcache/dataset/{key}", body.encode(), h)


def query(base, key, q, accept="application/json", headers=None):
    h = {"Accept": accept}
    h.update(headers or {})
    qs = urllib.parse.quote(json.dumps(q))
    return call(base, "GET", f"/qcache/dataset/{key}?q={qs}", None, h)


def test_status(server):
    code, body, _ = call(server, "GET", "/qcache/status")
    assert code == 200 and body == b"OK"


def test_store_query_roundtrip_csv_json(server):
    code, _, _ = store(server, "t1")
    assert code == 201
    code, body, headers = query(server, "t1", {"where": [">", "bar", 15]})
    assert code == 200
    rows = json.loads(body)
    assert sorted(r["foo"] for r in rows) == [2, 3]
    assert headers["X-QCache-unsliced-length"] == "2"

    code, body, _ = query(server, "t1", {}, accept="text/csv")
    assert code == 200
    assert body.decode().splitlines()[0] == "foo,bar"


def test_store_json_query(server):
    body = json.dumps([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    code, _, _ = store(server, "t2", body, ctype="application/json")
    assert code == 201
    code, out, _ = query(server, "t2", {"where": ["==", "b", "'y'"]})
    assert json.loads(out) == [{"a": 2, "b": "y"}]


def test_query_by_post(server):
    store(server, "t3")
    code, body, headers = call(
        server,
        "POST",
        "/qcache/dataset/t3/q",
        json.dumps({"select": [["count"]]}).encode(),
        {"Accept": "application/json"},
    )
    assert code == 200
    assert json.loads(body) == [{"count": 3}]


def test_pagination_header(server):
    store(server, "t4")
    code, body, headers = query(
        server, "t4", {"order_by": ["foo"], "offset": 1, "limit": 1}
    )
    assert json.loads(body) == [{"foo": 2, "bar": 20}]
    assert headers["X-QCache-unsliced-length"] == "3"


def test_unknown_dataset_404(server):
    code, body, _ = query(server, "nope", {})
    assert code == 404
    assert "error" in json.loads(body)


def test_malformed_query_400(server):
    store(server, "t5")
    code, body, _ = query(server, "t5", {"selcet": ["foo"]})
    assert code == 400
    assert "selcet" in json.loads(body)["error"]


def sql_post(base, sql, accept="application/json"):
    return call(
        base, "POST", "/qcache/sql", sql.encode(), {"Accept": accept}
    )


def test_sql_endpoint_select(server):
    store(server, "sqlt1")
    code, body, headers = sql_post(
        server, "SELECT foo, bar FROM sqlt1 WHERE bar > 15 ORDER BY foo"
    )
    assert code == 200
    assert json.loads(body) == [{"foo": 2, "bar": 20}, {"foo": 3, "bar": 30}]
    assert headers["X-QCache-unsliced-length"] == "2"
    # CSV negotiation works like the other endpoints
    code, body, _ = sql_post(server, "SELECT count(*) AS n FROM sqlt1", "text/csv")
    assert code == 200 and body.decode().splitlines() == ["n", "3"]


def test_sql_endpoint_cross_dataset_join(server):
    store(server, "sqlt2a", "k,v\n1,100\n2,200\n")
    store(server, "sqlt2b", "k,w\n2,x\n3,y\n")
    code, body, _ = sql_post(
        server,
        "SELECT a.k AS k, a.v AS v, b.w AS w FROM sqlt2a a JOIN sqlt2b b ON a.k = b.k",
    )
    assert code == 200
    assert json.loads(body) == [{"k": 2, "v": 200, "w": "x"}]


def test_sql_endpoint_rejects_writes_and_ddl(server):
    store(server, "sqlt3")
    for bad in [
        "INSERT INTO sqlt3 VALUES (9, 9)",
        "CREATE TABLE boom (a INT)",
        "DROP TABLE sqlt3",
        "SET spark.sql.shuffle.partitions=1",
        "CACHE TABLE sqlt3",
        "SELECT 1; SELECT 2",
        "SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`",
        "",
    ]:
        code, body, _ = sql_post(server, bad)
        assert code == 400, f"{bad!r} -> {code}"


def test_sql_endpoint_rejects_file_read_obfuscations(server):
    """The read check is structural (parsed-plan relation allowlist),
    so comment/case/quoting tricks that defeat a raw-text regex must
    still 400 — including path tables nested in subquery expressions
    and multi-part catalog names."""
    store(server, "sqlt6")
    for bad in [
        # bracketed comment between format token and dot/backtick
        "SELECT * FROM text/**/.`/etc/passwd`",
        "SELECT * FROM parquet/**/ . `/root/testdata/sf0.001/orders.parquet`",
        "SELECT * FROM PARQUET.`/root/testdata/sf0.001/orders.parquet`",
        # path table hidden inside a subquery EXPRESSION (not a plan child)
        "SELECT * FROM sqlt6 WHERE foo IN (SELECT 1 FROM text.`/etc/passwd`)",
        "SELECT (SELECT count(*) FROM text.`/etc/passwd`) AS n FROM sqlt6",
        # multi-part names: catalog / global temp / db-qualified
        "SELECT * FROM global_temp.anything",
        "SELECT * FROM spark_catalog.default.sqlt6",
        "SELECT * FROM default.sqlt6",
    ]:
        code, body, _ = sql_post(server, bad)
        assert code == 400, f"{bad!r} -> {code}"
        assert "error" in json.loads(body)


def test_sql_endpoint_semicolon_in_string_literal_ok(server):
    store(server, "sqlt7", "k,s\n1,a;b\n2,c\n")
    code, body, _ = sql_post(server, "SELECT k FROM sqlt7 WHERE s = 'a;b'")
    assert code == 200
    assert json.loads(body) == [{"k": 1}]
    # trailing semicolons still tolerated
    code, body, _ = sql_post(server, "SELECT count(*) AS n FROM sqlt7;")
    assert code == 200 and json.loads(body) == [{"n": 2}]


def test_sql_endpoint_ctes_and_result_cap(spark):
    srv = make_server(spark, sql_max_rows=4)
    serve_forever_in_thread(srv)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        store(base, "sqlt8", "a\n1\n2\n3\n")
        # CTE names are allowed relations
        code, body, _ = sql_post(
            base, "WITH c AS (SELECT a FROM sqlt8 WHERE a > 1) SELECT sum(a) AS s FROM c"
        )
        assert code == 200 and json.loads(body) == [{"s": 5}]
        # 3x3 cross join = 9 rows > cap of 4 -> 400, not an OOM attempt
        code, body, _ = sql_post(
            base, "SELECT x.a AS xa FROM sqlt8 x CROSS JOIN sqlt8 y"
        )
        assert code == 400 and "limit" in json.loads(body)["error"].lower()
        # an explicit LIMIT under the cap passes
        code, body, _ = sql_post(
            base, "SELECT x.a AS xa FROM sqlt8 x CROSS JOIN sqlt8 y LIMIT 3"
        )
        assert code == 200 and len(json.loads(body)) == 3
    finally:
        srv.shutdown()


def test_sql_endpoint_unknown_view_and_deleted_dataset(server):
    code, body, _ = sql_post(server, "SELECT * FROM no_such_view_xyz")
    assert code == 400
    # deleting a dataset removes its SQL view on the next sync
    store(server, "sqlt4")
    code, _, _ = sql_post(server, "SELECT count(*) AS n FROM sqlt4")
    assert code == 200
    call(server, "DELETE", "/qcache/dataset/sqlt4")
    code, _, _ = sql_post(server, "SELECT count(*) AS n FROM sqlt4")
    assert code == 400


def test_sql_endpoint_requires_auth_when_configured(spark):
    import base64

    srv = make_server(spark, basic_auth="u:p", allow_plaintext_auth=True)
    serve_forever_in_thread(srv)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, _, _ = call(base, "POST", "/qcache/sql", b"SELECT 1 AS x")
        assert code == 401
        auth = {"Authorization": "Basic " + base64.b64encode(b"u:p").decode()}
        code, body, _ = call(base, "POST", "/qcache/sql", b"SELECT 1 AS x", auth)
        assert code == 200 and json.loads(body) == [{"x": 1}]
    finally:
        srv.shutdown()


def test_sql_endpoint_sees_replaced_dataset(server):
    store(server, "sqlt5", "a\n1\n")
    code, body, _ = sql_post(server, "SELECT sum(a) AS s FROM sqlt5")
    assert json.loads(body) == [{"s": 1}]
    store(server, "sqlt5", "a\n5\n7\n")  # replace
    code, body, _ = sql_post(server, "SELECT sum(a) AS s FROM sqlt5")
    assert json.loads(body) == [{"s": 12}]


def test_unsupported_content_type_415(server):
    code, _, _ = store(server, "t6", "x", ctype="text/xml")
    assert code == 415


def test_unsupported_charset_400(server):
    code, _, _ = store(server, "t7", CSV_BODY, ctype="text/csv; charset=latin-1")
    assert code == 400


def test_not_acceptable_406(server):
    store(server, "t8")
    code, _, _ = query(server, "t8", {}, accept="text/xml")
    assert code == 406


def test_delete_dataset(server):
    store(server, "t9")
    code, _, _ = call(server, "DELETE", "/qcache/dataset/t9")
    assert code == 200
    code, _, _ = query(server, "t9", {})
    assert code == 404


def test_get_on_q_endpoint_is_404(server):
    store(server, "t10")
    code, _, _ = call(server, "GET", "/qcache/dataset/t10/q")
    assert code == 404


def test_type_hints(server):
    # all-digit strings must stay strings with a hint (README.rst:350-376)
    body = "some_key,value\n123456,1\nabcdef,2\n"
    store(server, "th", body, headers={"X-QCache-types": "some_key=string"})
    code, out, _ = query(server, "th", {"where": ["==", "some_key", "'123456'"]})
    assert code == 200
    assert json.loads(out) == [{"some_key": "123456", "value": 1}]


def test_unknown_type_hint_400(server):
    code, _, _ = store(
        server, "th2", CSV_BODY, headers={"X-QCache-types": "foo=bignum"}
    )
    assert code == 400


def test_stand_in_columns(server):
    store(
        server,
        "si",
        CSV_BODY,
        headers={"X-QCache-stand-in-columns": "baz=10;qux=baz"},
    )
    code, out, _ = query(server, "si", {"select": ["foo", "baz", "qux"], "limit": 1, "order_by": ["foo"]})
    assert json.loads(out) == [{"foo": 1, "baz": 10, "qux": 10}]


def test_stand_in_at_query_time(server):
    store(server, "si2")
    code, out, _ = query(
        server,
        "si2",
        {"select": ["foo", "extra"], "limit": 1, "order_by": ["foo"]},
        headers={"X-QCache-stand-in-columns": "extra='abc'"},
    )
    assert json.loads(out) == [{"foo": 1, "extra": "abc"}]


def test_update_statement_roundtrip(server):
    store(server, "upd")
    code, body, _ = call(
        server,
        "POST",
        "/qcache/dataset/upd/q",
        json.dumps({"update": [["+", "bar", 5]], "where": ["==", "foo", 1]}).encode(),
        {"Accept": "application/json"},
    )
    assert code == 200
    _, out, _ = query(server, "upd", {"order_by": ["foo"]})
    assert [r["bar"] for r in json.loads(out)] == [15, 20, 30]


def test_gzip_roundtrip(server):
    body = gzip.compress(CSV_BODY.encode())
    code, _, _ = call(
        server,
        "POST",
        "/qcache/dataset/gz",
        body,
        {"Content-Type": "text/csv", "Content-Encoding": "gzip"},
    )
    assert code == 201
    qs = urllib.parse.quote(json.dumps({}))
    code, out, headers = call(
        server,
        "GET",
        f"/qcache/dataset/gz?q={qs}",
        None,
        {"Accept": "application/json", "Accept-Encoding": "gzip"},
    )
    assert code == 200
    assert headers.get("Content-Encoding") == "gzip"
    assert len(json.loads(gzip.decompress(out))) == 3


def test_statistics_reset_on_read(server):
    store(server, "st")
    query(server, "st", {})
    query(server, "nope_missing", {})
    code, body, _ = call(server, "GET", "/qcache/statistics")
    snap = json.loads(body)
    assert snap["hit_count"] >= 1
    assert snap["miss_count"] >= 1
    assert snap["store_count"] >= 1
    assert len(snap["query_durations"]) >= 1
    assert snap["statistics_duration"] >= 0.0
    # after a read everything resets: only the standing keys remain
    # (reference contract, test_api.py:338-340)
    code, body, _ = call(server, "GET", "/qcache/statistics")
    snap2 = json.loads(body)
    assert set(snap2.keys()) == {
        "dataset_count", "cache_size", "statistics_duration", "statistics_buffer_size",
    }


def test_result_cache_serves_and_invalidates(server):
    store(server, "rc", "foo,bar\n1,10\n2,20\n")
    q = {"select": [["sum", "bar"]]}
    _, out1, _ = query(server, "rc", q)
    _, out2, _ = query(server, "rc", q)  # served from the result cache
    assert json.loads(out1) == json.loads(out2) == [{"bar": 30}]
    # update bumps the dataset version -> cache must not serve stale
    call(
        server,
        "POST",
        "/qcache/dataset/rc/q",
        json.dumps({"update": [["bar", 0]], "where": ["==", "foo", 1]}).encode(),
        {"Accept": "application/json"},
    )
    _, out3, _ = query(server, "rc", q)
    assert json.loads(out3) == [{"bar": 20}]
    # replacing the dataset invalidates too
    store(server, "rc", "foo,bar\n9,5\n")
    _, out4, _ = query(server, "rc", q)
    assert json.loads(out4) == [{"bar": 5}]


def test_basic_auth(spark):
    from qcache_spark.server import make_server, serve_forever_in_thread

    # plaintext basic auth needs the explicit opt-in (the TLS-required
    # refusal is covered in test_tls_cli.py)
    srv = make_server(spark, basic_auth="admin:secret", allow_plaintext_auth=True)
    serve_forever_in_thread(srv)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, _, headers = call(base, "GET", "/qcache/status")
        assert code == 401
        assert "Basic" in headers.get("WWW-Authenticate", "")
        import base64

        good = {"Authorization": "Basic " + base64.b64encode(b"admin:secret").decode()}
        code, body, _ = call(base, "GET", "/qcache/status", None, good)
        assert code == 200 and body == b"OK"
        bad = {"Authorization": "Basic " + base64.b64encode(b"admin:wrong").decode()}
        assert call(base, "GET", "/qcache/status", None, bad)[0] == 401
    finally:
        srv.shutdown()


def test_replace_key(server):
    store(server, "rk")
    store(server, "rk", "foo,bar\n9,90\n")
    code, out, _ = query(server, "rk", {})
    assert json.loads(out) == [{"foo": 9, "bar": 90}]


def test_statistics_duration_is_time_since_reset(server):
    import time as _t

    # drain whatever the previous tests accumulated → resets the clock
    call(server, "GET", "/qcache/statistics")
    _t.sleep(0.3)
    _, body, _ = call(server, "GET", "/qcache/statistics")
    snap = json.loads(body)
    # reference semantics (qcache/statistics.py): duration covers the
    # whole window since the last reset, not the snapshot call itself
    assert snap["statistics_duration"] >= 0.25


def test_store_bucketed_header(spark):
    """X-QCache-bucket-by extension header: dataset lands in the
    bucketed layout and queries on the key stay exchange-free."""
    from qcache_spark.server import make_server, serve_forever_in_thread

    srv = make_server(spark)
    serve_forever_in_thread(srv)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        body = "k,v\n" + "\n".join(f"{i % 5},{i}" for i in range(200))
        code, _, _ = store(
            base, "bkt", body, headers={"X-QCache-bucket-by": "k:4"}
        )
        assert code == 201
        item = srv.RequestHandlerClass.catalog.get("bkt")
        assert item.bucket_by == (("k",), 4)
        plan = item.df.groupBy("k").count()._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        code, out, _ = query(
            base, "bkt", {"group_by": ["k"], "select": ["k", ["sum", "v"]],
                          "order_by": ["k"]}
        )
        assert code == 200
        rows = json.loads(out)
        assert len(rows) == 5 and rows[0]["k"] == 0
        # malformed bucket spec → 400
        code, _, _ = store(base, "bad", body, headers={"X-QCache-bucket-by": ":x"})
        assert code == 400
    finally:
        srv.shutdown()


def test_custom_url_prefix(spark):
    srv = make_server(spark, url_prefix="/api/v2")
    serve_forever_in_thread(srv)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, body, _ = call(base, "GET", "/api/v2/status")
        assert code == 200 and body == b"OK"
        # default prefix no longer routes
        code, _, _ = call(base, "GET", "/qcache/status")
        assert code == 404
        code, _, _ = call(
            base, "POST", "/api/v2/dataset/px", CSV_BODY.encode(),
            {"Content-Type": "text/csv"},
        )
        assert code == 201
        qs = urllib.parse.quote(json.dumps({"select": ["foo"]}))
        code, body, _ = call(
            base, "GET", f"/api/v2/dataset/px?q={qs}", None,
            {"Accept": "application/json"},
        )
        assert code == 200 and len(json.loads(body)) == 3
    finally:
        srv.shutdown()


def test_rollup_grammar_over_http(server):
    """Structured group_by travels the full HTTP path: JSON dict in
    the q param -> compile -> rollup rows (incl. the grand total) on
    the wire; malformed specs 400 like any grammar error."""
    store(server, "gs1", "g,v\na,1\na,2\nb,3\n")
    code, body, _ = query(
        server, "gs1",
        {"group_by": {"rollup": ["g"]}, "select": ["g", ["sum", "v"]]},
    )
    assert code == 200
    rows = {r["g"]: r["v"] for r in json.loads(body)}
    assert rows == {"a": 3, "b": 3, None: 6}
    code, body, _ = query(
        server, "gs1",
        {"group_by": {"bogus": ["g"]}, "select": ["g", ["sum", "v"]]},
    )
    assert code == 400


# -- pipeline-operator endpoint (server/pipeline.py) ------------------


def pipeline(base, key, spec, accept="application/json"):
    return call(
        base,
        "POST",
        f"/qcache/dataset/{key}/pipeline",
        json.dumps(spec).encode(),
        {"Accept": accept},
    )


def test_pipeline_dedup_count(server):
    store(server, "pl1", "a,b\n1,x\n1,x\n2,y\n3,y\n")
    code, body, _ = pipeline(server, "pl1", {"op": "dedup_count"})
    assert code == 200
    assert json.loads(body) == [
        {"n_rows": 4, "n_distinct": 3, "n_duplicates": 1}
    ]
    code, body, _ = pipeline(
        server, "pl1", {"op": "dedup_count", "params": {"columns": ["b"]}}
    )
    assert json.loads(body) == [
        {"n_rows": 4, "n_distinct": 2, "n_duplicates": 2}
    ]


def test_pipeline_cardinality(server):
    store(server, "pl2", "g,v\na,1\na,1\na,2\nb,9\n")
    code, body, _ = pipeline(
        server,
        "pl2",
        {"op": "cardinality", "params": {"column": "v", "exact": True}},
    )
    assert code == 200
    assert json.loads(body) == [{"n_distinct": 3}]
    code, body, _ = pipeline(
        server,
        "pl2",
        {
            "op": "cardinality",
            "params": {"column": "v", "group_by": ["g"], "exact": True},
        },
    )
    got = {r["g"]: r["n_distinct"] for r in json.loads(body)}
    assert got == {"a": 2, "b": 1}
    # HLL estimate at tiny cardinalities is exact
    code, body, _ = pipeline(
        server, "pl2", {"op": "cardinality", "params": {"column": "v"}}
    )
    assert json.loads(body) == [{"n_distinct": 3}]


def test_pipeline_split_counts(server):
    rows = "".join(f"{i},p\n" for i in range(40))
    store(server, "pl3", "id,x\n" + rows)
    code, body, _ = pipeline(
        server,
        "pl3",
        {
            "op": "split_counts",
            "params": {
                "key_column": "id",
                "weights": {"train": 8, "valid": 1, "test": 1},
            },
        },
    )
    assert code == 200
    got = {r["split"]: r["n_rows"] for r in json.loads(body)}
    assert set(got) <= {"train", "valid", "test"}
    assert sum(got.values()) == 40
    assert got["train"] > got.get("valid", 0)  # 8:1:1 weighting


def test_pipeline_quality_summary(server):
    body = json.dumps(
        [
            {"doc": 1, "text": "the quick brown fox jumps over the lazy dog"},
            {"doc": 2, "text": "1234 5678 !!!! ????"},
        ]
    )
    store(server, "pl4", body, ctype="application/json")
    code, out, _ = pipeline(
        server, "pl4", {"op": "quality_summary", "params": {"text_column": "text"}}
    )
    assert code == 200
    (row,) = json.loads(out)
    assert row["n_rows"] == 2
    assert 0.0 <= row["min_quality"] <= row["p50_quality"] <= row["max_quality"] <= 1.0
    assert row["max_quality"] > 0.5  # the clean English sentence


def test_pipeline_csv_negotiation(server):
    store(server, "pl5", "a\n1\n1\n")
    code, body, _ = pipeline(
        server, "pl5", {"op": "dedup_count"}, accept="text/csv"
    )
    assert code == 200
    lines = body.decode().splitlines()
    assert lines[0] == "n_rows,n_distinct,n_duplicates"
    assert lines[1] == "2,1,1"


def test_pipeline_errors(server):
    store(server, "pl6", "a,b\n1,x\n")
    # unknown dataset -> 404
    code, _, _ = pipeline(server, "nope_pipeline", {"op": "dedup_count"})
    assert code == 404
    # malformed JSON -> 400
    code, body, _ = call(
        server, "POST", "/qcache/dataset/pl6/pipeline", b"{not json",
        {"Accept": "application/json"},
    )
    assert code == 400
    # unknown op -> 400 listing supported ops
    code, body, _ = pipeline(server, "pl6", {"op": "drop_table"})
    assert code == 400 and b"dedup_count" in body
    # unknown column -> 400
    code, _, _ = pipeline(
        server, "pl6", {"op": "cardinality", "params": {"column": "zz"}}
    )
    assert code == 400
    # unknown param -> 400
    code, _, _ = pipeline(
        server, "pl6", {"op": "dedup_count", "params": {"colums": ["a"]}}
    )
    assert code == 400
    # bad weights -> 400, not a 500
    code, _, _ = pipeline(
        server,
        "pl6",
        {
            "op": "split_counts",
            "params": {"key_column": "a", "weights": {"train": -1}},
        },
    )
    assert code == 400
    # bad rsd -> 400
    code, _, _ = pipeline(
        server,
        "pl6",
        {"op": "cardinality", "params": {"column": "a", "rsd": 2.0}},
    )
    assert code == 400
    # non-object body -> 400
    code, _, _ = pipeline(server, "pl6", ["op", "dedup_count"])
    assert code == 400


def test_pipeline_top_values(server):
    store(server, "pl7", "k\n" + "a\n" * 5 + "b\n" * 3 + "c\n" + "d\n")
    code, body, _ = pipeline(
        server, "pl7", {"op": "top_values", "params": {"column": "k", "n": 2}}
    )
    assert code == 200
    assert json.loads(body) == [
        {"value": "a", "n_rows": 5},
        {"value": "b", "n_rows": 3},
    ]
    # deterministic tiebreak on the value itself: c before d at n=4
    code, body, _ = pipeline(
        server, "pl7", {"op": "top_values", "params": {"column": "k", "n": 4}}
    )
    assert [r["value"] for r in json.loads(body)] == ["a", "b", "c", "d"]
    # bad n -> 400
    code, _, _ = pipeline(
        server, "pl7", {"op": "top_values", "params": {"column": "k", "n": 0}}
    )
    assert code == 400


def test_pipeline_validation_hardening(server):
    store(server, "pl8", "a,b\n1,x\n2,y\n3,z\n")
    # non-string op (unhashable) -> 400, not a 500 TypeError
    code, _, _ = pipeline(server, "pl8", {"op": ["dedup_count"]})
    assert code == 400
    code, _, _ = pipeline(server, "pl8", {"op": {"x": 1}})
    assert code == 400
    # group_by: null / non-list -> 400, not a 500 TypeError
    for bad in (None, "a", 0, False):
        code, _, _ = pipeline(
            server,
            "pl8",
            {"op": "cardinality", "params": {"column": "b", "group_by": bad}},
        )
        assert code == 400, bad
    # grouped cardinality on a near-unique key stays bounded (cap), so
    # the summary contract holds even for pathological group keys
    code, body, _ = pipeline(
        server,
        "pl8",
        {
            "op": "cardinality",
            "params": {"column": "b", "group_by": ["a"], "exact": True},
        },
    )
    assert code == 200 and len(json.loads(body)) == 3  # <= _MAX_GROUPS


def test_explain_endpoint(server):
    store(server, "ex1", "a,b\n1,x\n2,y\n3,z\n")
    code, body, _ = call(
        server,
        "POST",
        "/qcache/dataset/ex1/explain",
        json.dumps({"where": [">", "a", 1], "select": ["a"]}).encode(),
    )
    assert code == 200
    plan = body.decode()
    assert "Filter" in plan or "LocalTableScan" in plan
    # update statements have no read plan -> 400
    code, _, _ = call(
        server,
        "POST",
        "/qcache/dataset/ex1/explain",
        json.dumps({"update": [["a", 1]]}).encode(),
    )
    assert code == 400
    # malformed JSON -> 400, unknown dataset -> 404
    code, _, _ = call(server, "POST", "/qcache/dataset/ex1/explain", b"{oops")
    assert code == 400
    code, _, _ = call(
        server, "POST", "/qcache/dataset/nope_ex/explain", b"{}"
    )
    assert code == 404


def test_pipeline_histogram(server):
    store(server, "pl9", "v\n0\n1\n2\n3\n4\n5\n6\n7\n8\n10\n")
    code, body, _ = pipeline(
        server, "pl9", {"op": "histogram", "params": {"column": "v", "bins": 2}}
    )
    assert code == 200
    rows = json.loads(body)
    # domain [0,10], width 5: [0,5) has 0..4 -> 5 rows, [5,10] has
    # 5..8 and the closed right edge 10 -> 5 rows
    assert [(r["bin_start"], r["bin_end"], r["n_rows"]) for r in rows] == [
        (0.0, 5.0, 5),
        (5.0, 10.0, 5),
    ]
    # explicit domain narrows the census to [0, 4]
    code, body, _ = pipeline(
        server,
        "pl9",
        {"op": "histogram",
         "params": {"column": "v", "bins": 2, "min": 0, "max": 4}},
    )
    rows = json.loads(body)
    assert sum(r["n_rows"] for r in rows) == 5
    # constant column: degenerate single-bin answer, not a crash
    store(server, "pl9c", "v\n7\n7\n7\n")
    code, body, _ = pipeline(
        server, "pl9c", {"op": "histogram", "params": {"column": "v"}}
    )
    assert code == 200
    assert json.loads(body) == [{"bin_start": 7.0, "bin_end": 7.0, "n_rows": 3}]
    # all-null numeric column: empty histogram, not a 500 (ADVICE r6 —
    # float(None) on the min/max agg)
    store(server, "pl9n", "k,v\na,\nb,\n", headers={"X-QCache-types": "v=float"})
    code, body, _ = pipeline(
        server, "pl9n", {"op": "histogram", "params": {"column": "v"}}
    )
    assert code == 200
    assert json.loads(body) == []
    # one explicit bound + all-null data: still empty, still 200
    code, body, _ = pipeline(
        server, "pl9n",
        {"op": "histogram", "params": {"column": "v", "min": 0}},
    )
    assert code == 200
    assert json.loads(body) == []
    # non-numeric column / bad bins -> 400
    store(server, "pl9s", "s\nx\ny\n")
    code, _, _ = pipeline(
        server, "pl9s", {"op": "histogram", "params": {"column": "s"}}
    )
    assert code == 400
    code, _, _ = pipeline(
        server, "pl9", {"op": "histogram", "params": {"column": "v", "bins": 0}}
    )
    assert code == 400
    code, _, _ = pipeline(
        server, "pl9",
        {"op": "histogram", "params": {"column": "v", "min": "zero"}},
    )
    assert code == 400


def test_pipeline_funnel(server):
    store(
        server,
        "pl10",
        "user_id,event_type,ts\n"
        "1,view,2024-01-01 00:00:00\n"
        "1,click,2024-01-01 00:01:00\n"
        "1,purchase,2024-01-01 00:02:00\n"
        "2,view,2024-01-01 00:00:00\n"
        "2,click,2024-01-01 00:01:00\n"
        # user 3 clicks BEFORE viewing: strict ordering drops the click
        "3,click,2024-01-01 00:00:00\n"
        "3,view,2024-01-01 00:01:00\n",
    )
    code, body, _ = pipeline(
        server,
        "pl10",
        {"op": "funnel", "params": {"steps": ["view", "click", "purchase"]}},
    )
    assert code == 200
    rows = {r["step"]: r["n_users"] for r in json.loads(body)}
    assert rows == {"view": 3, "click": 2, "purchase": 1}
    # duplicate steps / empty steps / unknown column -> 400
    for bad in (
        {"steps": ["view", "view"]},
        {"steps": []},
        {"steps": ["view"], "user_column": "nope"},
    ):
        code, _, _ = pipeline(server, "pl10", {"op": "funnel", "params": bad})
        assert code == 400


def test_pipeline_percentiles(server):
    store(server, "pl11", "g,v\n" + "".join(f"a,{i}\n" for i in range(1, 101)))
    code, body, _ = pipeline(
        server,
        "pl11",
        {"op": "percentiles",
         "params": {"column": "v", "probabilities": [0.5, 0.99]}},
    )
    assert code == 200
    row = json.loads(body)[0]
    assert row["p0_5"] == 50 and row["p0_99"] == 99
    # grouped form keeps the group key and flattens per-prob columns
    code, body, _ = pipeline(
        server,
        "pl11",
        {"op": "percentiles",
         "params": {"column": "v", "probabilities": [0.5], "group_by": ["g"]}},
    )
    assert json.loads(body) == [{"g": "a", "p0_5": 50}]
    # bad probability / non-numeric column -> 400
    code, _, _ = pipeline(
        server, "pl11",
        {"op": "percentiles", "params": {"column": "v", "probabilities": [1.5]}},
    )
    assert code == 400
    code, _, _ = pipeline(
        server, "pl11",
        {"op": "percentiles", "params": {"column": "g"}},
    )
    assert code == 400


def test_operator_caches_endpoint(server, spark):
    """GET /qcache/operator-caches lists registered operator-lifetime
    cache families; DELETE releases them (the opcache.py workload-
    boundary API exposed without Python)."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from qcache_spark import opcache

    frame = spark.range(100).withColumn("x", F.lit(1)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    frame.count()
    opcache.register(spark, "http.test", frame, budget=0)
    code, body, _ = call(server, "GET", "/qcache/operator-caches")
    assert code == 200
    snap = json.loads(body)
    assert "http.test" in snap["families"]
    assert snap["cached_bytes"] > 0
    code, body, _ = call(server, "DELETE", "/qcache/operator-caches")
    assert code == 200
    assert json.loads(body)["released"] >= 1
    code, body, _ = call(server, "GET", "/qcache/operator-caches")
    assert json.loads(body)["families"] == []


def test_store_empty_dataset(server):
    """Header-only CSV and [] JSON store as zero-row datasets and
    query back as [] — the reference's pandas engine accepts these;
    Spark's CANNOT_INFER_EMPTY_SCHEMA must not surface as a 500."""
    code, _, _ = store(server, "empty1", "a,b\n")
    assert code == 201
    code, body, _ = query(server, "empty1", {})
    assert code == 200 and json.loads(body) == []
    code, _, _ = store(
        server, "empty2", "[]", ctype="application/json"
    )
    assert code == 201
    code, body, _ = query(server, "empty2", {"where": ["==", "x", 1]})
    # unknown column on a zero-column dataset is still a 400, not a 500
    assert code == 400


EVENTS_CSV = (
    "event_id,user_id,event_type,ts,value\n"
    "1,1,view,2024-01-01 10:00:00,1.0\n"
    "2,1,click,2024-01-01 10:30:00,2.5\n"
    "3,1,purchase,2024-01-01 11:10:00,9.0\n"
    "4,2,view,2024-01-01 10:05:00,1.5\n"
    "5,2,click,2024-01-01 11:20:00,0.5\n"
    "6,3,view,2024-01-01 12:00:00,3.0\n"
)


def test_pipeline_ohlc(server):
    store(server, "plohlc", EVENTS_CSV)
    code, body, _ = pipeline(
        server, "plohlc",
        {"op": "ohlc", "params": {"group_by": "event_type",
                                  "bucket_seconds": 3600}},
    )
    assert code == 200
    rows = json.loads(body)
    view_10 = [r for r in rows if r["event_type"] == "view"
               and r["bucket_start_s"] == 1704103200][0]
    assert view_10["n"] == 2
    assert view_10["open"] == 1.0 and view_10["close"] == 1.5
    assert view_10["high"] == 1.5 and view_10["low"] == 1.0
    assert view_10["sum_value_e4"] == 25000
    # ungrouped form aggregates across types
    code, body, _ = pipeline(
        server, "plohlc",
        {"op": "ohlc", "params": {"group_by": None, "bucket_seconds": 86400}},
    )
    rows = json.loads(body)
    assert len(rows) == 1 and rows[0]["n"] == 6
    # bad bucket / unknown column -> 400
    code, _, _ = pipeline(
        server, "plohlc", {"op": "ohlc", "params": {"bucket_seconds": 0}}
    )
    assert code == 400
    code, _, _ = pipeline(
        server, "plohlc", {"op": "ohlc", "params": {"value_column": "nope"}}
    )
    assert code == 400
    # non-numeric value column -> 400
    code, _, _ = pipeline(
        server, "plohlc", {"op": "ohlc", "params": {"value_column": "event_type"}}
    )
    assert code == 400


def test_pipeline_percentile_stats(server):
    store(server, "plpct", EVENTS_CSV)
    code, body, _ = pipeline(
        server, "plpct",
        {"op": "percentile_stats", "params": {"pct": 0.5}},
    )
    assert code == 200
    rows = {r["event_type"]: r for r in json.loads(body)}
    # view values: 1.0, 1.5, 3.0 -> k=2, p50 = 1.5
    assert rows["view"]["n"] == 3 and rows["view"]["k"] == 2
    assert rows["view"]["p_value"] == 1.5 and rows["view"]["n_tail"] == 1
    code, _, _ = pipeline(
        server, "plpct", {"op": "percentile_stats", "params": {"pct": 1.5}}
    )
    assert code == 400
    code, _, _ = pipeline(
        server, "plpct",
        {"op": "percentile_stats", "params": {"value_column": "event_type"}},
    )
    assert code == 400


def test_max_result_rows_cap(spark):
    """VERDICT r7 missing #1: with max_result_rows set, an uncapped
    query over a bigger-than-cap dataset gets a 413 with the documented
    error body instead of a driver-side full materialization; a
    windowed query under the cap still succeeds; the default (0) keeps
    the reference's full-table contract."""
    srv = make_server(spark, max_cache_size=1 << 30, max_result_rows=2)
    serve_forever_in_thread(srv)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, _, _ = store(base, "capped")  # 3 rows > cap of 2
        assert code == 201
        code, body, _ = query(base, "capped", {})
        assert code == 413
        assert b"materialization cap" in body
        # a sliced page under the cap works, with the true unsliced length
        code, body, headers = query(base, "capped", {"limit": 2})
        assert code == 200
        assert len(json.loads(body)) == 2
        assert headers["X-QCache-unsliced-length"] == "3"
        # filters that shrink the result under the cap also pass
        code, body, _ = query(base, "capped", {"where": [">", "bar", 15]})
        assert code == 200 and len(json.loads(body)) == 2
    finally:
        srv.shutdown()


def test_streaming_csv_egress_bypasses_cap(spark):
    """VERDICT r8 missing #2: an over-cap result with the streaming
    opt-in (X-QCache-Stream: csv) arrives complete as chunked CSV
    with bounded driver memory; without the opt-in the 413 contract
    is unchanged; a non-CSV Accept with the opt-in is 406."""
    srv = make_server(spark, max_cache_size=1 << 30, max_result_rows=2)
    serve_forever_in_thread(srv)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        code, _, _ = store(base, "bigexp")  # 3 rows > cap of 2
        assert code == 201
        # default: still refused
        code, body, _ = query(base, "bigexp", {})
        assert code == 413
        # opt-in: full table streams through the cap
        code, body, headers = query(
            base, "bigexp", {}, accept="text/csv",
            headers={"X-QCache-Stream": "csv"},
        )
        assert code == 200
        assert headers.get("Transfer-Encoding") == "chunked"
        assert "Content-Length" not in headers
        lines = body.decode().strip().splitlines()
        assert lines[0].split(",")[0] == "foo"
        assert len(lines) == 1 + 3  # header + ALL rows, not the cap
        # ordering/filters still apply on the streamed plan
        code, body, _ = query(
            base, "bigexp", {"where": [">", "bar", 15]},
            accept="text/csv", headers={"X-QCache-Stream": "csv"},
        )
        assert code == 200
        assert len(body.decode().strip().splitlines()) == 1 + 2
        # JSON accept cannot stream: explicit 406, not silent fallback
        code, body, _ = query(
            base, "bigexp", {}, headers={"X-QCache-Stream": "csv"}
        )
        assert code == 406
        # zero-row streamed result still carries the CSV header line
        code, body, _ = query(
            base, "bigexp", {"where": [">", "bar", 10_000]},
            accept="text/csv", headers={"X-QCache-Stream": "csv"},
        )
        assert code == 200
        assert body.decode().strip().splitlines()[0].startswith("foo")
    finally:
        srv.shutdown()


def test_streaming_csv_matches_monolithic_rendering(spark):
    """Chunk boundaries must not change value rendering: a column
    whose nulls sit in a later batch renders ints identically in
    every batch (object-dtype construction, not per-batch inference)."""
    from qcache_spark.sources.ingest import iter_csv_chunks

    rows = [(i, i * 10 if i != 7 else None) for i in range(9)]
    df = spark.createDataFrame(rows, ["k", "v"]).orderBy("k")
    streamed = b"".join(iter_csv_chunks(df, batch_rows=3)).decode()
    lines = streamed.strip().splitlines()
    assert lines[0] == "k,v"
    assert lines[1] == "0,0"       # int rendering in the null-free batch
    assert lines[8] == "7,"        # null renders empty
    assert lines[9] == "8,80"      # batch AFTER the null: still int
    assert len(lines) == 10


def test_pipeline_percentile_stats_null_groups(server):
    """ADVICE r7: nulls in group_column must not 500 the op (null-group
    rows are documented as excluded, '' parses as null on ingest)."""
    csv = (
        "event_id,user_id,event_type,ts,value\n"
        "1,1,view,2024-01-01 10:00:00,1.0\n"
        "2,1,,2024-01-01 10:30:00,2.5\n"
        "3,2,view,2024-01-01 11:10:00,3.0\n"
        "4,2,,2024-01-01 11:20:00,4.0\n"
    )
    store(server, "plpctnull", csv)
    code, body, _ = pipeline(
        server, "plpctnull",
        {"op": "percentile_stats", "params": {"pct": 1.0}},
    )
    assert code == 200
    rows = {r["event_type"]: r for r in json.loads(body)}
    assert set(rows) == {"view"}  # null group excluded, not crashed
    assert rows["view"]["n"] == 2 and rows["view"]["p_value"] == 3.0
    # degenerate: EVERY group null -> empty result, still 200
    csv_all_null = (
        "event_id,user_id,event_type,ts,value\n"
        "1,1,,2024-01-01 10:00:00,1.0\n"
        "2,1,,2024-01-01 10:30:00,2.5\n"
    )
    store(server, "plpctnull2", csv_all_null)
    code, body, _ = pipeline(
        server, "plpctnull2", {"op": "percentile_stats", "params": {}}
    )
    assert code == 200
    assert json.loads(body) == []


def test_pipeline_transitions(server):
    store(server, "pltr", EVENTS_CSV)
    code, body, _ = pipeline(server, "pltr", {"op": "transitions"})
    assert code == 200
    rows = {(r["from_type"], r["to_type"]): r for r in json.loads(body)}
    # u1: view->click->purchase; u2: view->click; u3: no transition
    assert rows[("view", "click")]["n_transitions"] == 2
    assert rows[("view", "click")]["n_users"] == 2
    assert rows[("click", "purchase")]["n_transitions"] == 1
    assert ("purchase", "view") not in rows
    code, _, _ = pipeline(
        server, "pltr", {"op": "transitions", "params": {"user_column": "nope"}}
    )
    assert code == 400


def test_pipeline_snapshot_diff(server):
    store(server, "snap_old", "id,price,qty\n1,10,5\n2,20,3\n3,30,1\n")
    store(server, "snap_new", "id,price,qty\n2,20,4\n3,30,1\n4,40,2\n")
    code, body, _ = pipeline(
        server, "snap_old",
        {"op": "snapshot_diff", "params": {"right": "snap_new", "keys": ["id"]}},
    )
    assert code == 200
    m = {r["metric"]: r["n_rows"] for r in json.loads(body)}
    assert m["added"] == 1      # id 4
    assert m["removed"] == 1    # id 1
    assert m["changed"] == 1    # id 2 (qty 3 -> 4)
    assert m["unchanged"] == 1  # id 3
    assert m["col:qty"] == 1 and m["col:price"] == 0
    # compare_columns restricts the census
    code, body, _ = pipeline(
        server, "snap_old",
        {"op": "snapshot_diff",
         "params": {"right": "snap_new", "keys": ["id"],
                    "compare_columns": ["price"]}},
    )
    m = {r["metric"]: r["n_rows"] for r in json.loads(body)}
    assert m["changed"] == 0 and m["unchanged"] == 2 and "col:qty" not in m
    # unknown right dataset -> 404; bad keys -> 400
    code, _, _ = pipeline(
        server, "snap_old",
        {"op": "snapshot_diff", "params": {"right": "nope", "keys": ["id"]}},
    )
    assert code == 404
    code, _, _ = pipeline(
        server, "snap_old",
        {"op": "snapshot_diff", "params": {"right": "snap_new", "keys": []}},
    )
    assert code == 400
    code, _, _ = pipeline(
        server, "snap_old",
        {"op": "snapshot_diff",
         "params": {"right": "snap_new", "keys": ["id"],
                    "compare_columns": ["id"]}},
    )
    assert code == 400
    code, _, _ = pipeline(
        server, "snap_old",
        {"op": "snapshot_diff", "params": {"keys": ["id"]}},
    )
    assert code == 400


def test_pipeline_check_constraints(server):
    store(server, "plq", "id,v\n1,10\n2,20\n3,\n")
    code, body, _ = pipeline(
        server,
        "plq",
        {"op": "check_constraints", "params": {"constraints": [
            {"name": "id_ok", "kind": "completeness", "col": "id",
             "min_rate": 1.0},
            {"name": "v_ok", "kind": "completeness", "col": "v",
             "min_rate": 0.9},
            {"name": "rows", "kind": "row_count", "op": ">=", "bound": 3},
        ]}},
    )
    assert code == 200
    rows = {r["check_name"]: r for r in json.loads(body)}
    assert rows["id_ok"]["passed"] == 1
    # 2/3 non-null -> 666666 < 900000
    assert rows["v_ok"]["metric_e6"] == 666666
    assert rows["v_ok"]["passed"] == 0
    assert rows["rows"]["passed"] == 1
    # 400 paths: bad spec, unknown column, unknown param
    code, body, _ = pipeline(
        server, "plq", {"op": "check_constraints", "params": {}}
    )
    assert code == 400
    code, body, _ = pipeline(
        server,
        "plq",
        {"op": "check_constraints", "params": {"constraints": [
            {"name": "x", "kind": "completeness", "col": "nope",
             "min_rate": 1.0}]}},
    )
    assert code == 400
    code, body, _ = pipeline(
        server,
        "plq",
        {"op": "check_constraints", "params": {"constraints": [
            {"name": "x", "kind": "wat", "col": "id"}]}},
    )
    assert code == 400


def test_pipeline_drift(server):
    store(server, "drift_old", "lang,n\nen,50\nen,150\nde,250\n")
    store(server, "drift_new", "lang,n\nen,50\nfr,150\nfr,250\n")
    code, body, _ = pipeline(
        server,
        "drift_old",
        {"op": "drift", "params": {
            "right": "drift_new",
            "categorical": ["lang"],
            "numeric_bins": {"n": [100, 200]},
        }},
    )
    assert code == 200
    rows = {(r["column"], r["bucket"]): r for r in json.loads(body)}
    assert rows[("lang", "fr")]["base_n"] == 0
    assert rows[("lang", "fr")]["curr_n"] == 2
    assert rows[("n", "[100,200)")]["base_n"] == 1
    assert all(r["psi_e6"] >= 0 for r in rows.values())
    # 400: missing right, unknown right -> 404, unknown column
    code, _, _ = pipeline(server, "drift_old", {"op": "drift", "params": {}})
    assert code == 400
    code, _, _ = pipeline(
        server, "drift_old",
        {"op": "drift", "params": {"right": "no_such", "categorical": ["lang"]}},
    )
    assert code == 404
    code, _, _ = pipeline(
        server, "drift_old",
        {"op": "drift", "params": {"right": "drift_new",
                                   "categorical": ["nope"]}},
    )
    assert code == 400
    # ADVICE r11: explicit falsy non-list categorical (JSON null / 0
    # / "") must be a 400 on the isinstance guard, not a 500 from
    # list(None) deep inside population_stability
    for bad in (None, 0, ""):
        code, _, _ = pipeline(
            server, "drift_old",
            {"op": "drift", "params": {"right": "drift_new",
                                       "categorical": bad}},
        )
        # None/0/"" normalize to [] -> "nothing to track" ValueError
        # -> 400 either way; the point is it is never a 500
        assert code == 400
    code, _, _ = pipeline(
        server, "drift_old",
        {"op": "drift", "params": {"right": "drift_new",
                                   "categorical": {"lang": 1}}},
    )
    assert code == 400


def test_pipeline_drift_high_cardinality_400(server):
    """ADVICE r11: PSI rows are ADDITIVE per column, so silently
    truncating at _MAX_GROUPS would under-report drift. Over-cap
    bucket counts must refuse with a 400 naming the fix."""
    csv = "k\n" + "\n".join(f"v{i}" for i in range(1100))
    store(server, "drift_hc_a", csv)
    store(server, "drift_hc_b", csv)
    code, body, _ = pipeline(
        server, "drift_hc_a",
        {"op": "drift", "params": {"right": "drift_hc_b",
                                   "categorical": ["k"]}},
    )
    assert code == 400
    assert b"high-cardinality" in body
