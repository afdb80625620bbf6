"""SMT library semantics (reference tests:
debezium-core/src/test/java/io/debezium/transforms/*Test.java)."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark.generator import gen_change_log
from debezium_spark.operators import transforms as tr


def _log(spark, **kw):
    kw.setdefault("n_events", 600)
    return gen_change_log(spark, 4, 10, **kw)


def test_drop_tombstones(spark):
    log = _log(spark)
    out = tr.drop_tombstones(log)
    assert out.filter(F.col("is_tombstone")).count() == 0
    n_d = log.filter(F.col("op") == "d").count()
    assert log.count() - out.count() == n_d  # one tombstone per delete


def test_skip_operations(spark):
    log = tr.drop_tombstones(_log(spark))
    out = tr.skip_operations(log, ("d",))
    assert out.filter(F.col("op") == "d").count() == 0
    assert out.count() == log.filter(F.col("op") != "d").count()


def test_extract_new_record_state_drop(spark):
    """ExtractNewRecordStateTest semantics: flatten after, drop deletes."""
    log = _log(spark)
    flat = tr.extract_new_record_state(log, delete_mode="drop")
    assert set(flat.columns) == {
        "repo", "path", "commit", "lang", "content", "__op", "__ts_ms",
    }
    assert flat.filter(F.col("__op") == "d").count() == 0
    assert flat.filter(F.col("repo").isNull()).count() == 0


def test_extract_new_record_state_rewrite(spark):
    flat = tr.extract_new_record_state(
        _log(spark), delete_mode="rewrite", add_source_fields=("table",)
    )
    assert "__deleted" in flat.columns and "__source_table" in flat.columns
    dels = flat.filter(F.col("__deleted"))
    assert dels.count() > 0
    # delete rows are built from the before image — key cols present
    assert dels.filter(F.col("repo").isNull()).count() == 0


def test_pk_change_split(spark):
    log = tr.drop_tombstones(_log(spark, n_events=3000))
    pk_changes = log.filter(
        (F.col("op") == "u")
        & (
            (F.col("before.repo") != F.col("after.repo"))
            | (F.col("before.path") != F.col("after.path"))
        )
    ).count()
    assert pk_changes > 0, "fixture must contain PK-change updates"
    out = tr.pk_change_split(log)
    assert out.count() == log.count() + pk_changes  # each split into 2
    # after split no update changes its key
    assert (
        out.filter(
            (F.col("op") == "u")
            & (F.col("before.repo") != F.col("after.repo"))
        ).count()
        == 0
    )
    # delete halves carry the old key, create halves the new key
    split_dels = out.filter((F.col("op") == "d") & F.col("before").isNotNull())
    assert (
        split_dels.filter(F.col("key.repo") != F.col("before.repo")).count() == 0
    )


def test_skip_unchanged_updates(spark):
    log = tr.drop_tombstones(_log(spark))
    # clone one update's after into before => unchanged row must drop
    unchanged = log.filter(F.col("op") == "u").limit(1).withColumn(
        "before", F.col("after")
    )
    mixed = log.unionByName(unchanged)
    out = tr.skip_unchanged_updates(mixed)
    assert mixed.count() - out.count() == 1


def test_maskers(spark):
    log = tr.drop_tombstones(_log(spark)).filter(F.col("after").isNotNull())
    t = tr.truncate_image_field(log, "after", "content", 10)
    assert t.agg(F.max(F.length("after.content"))).collect()[0][0] <= 10
    m = tr.mask_image_field(log, "after", "content", "***")
    assert m.select("after.content").distinct().collect()[0][0] == "***"
    h = tr.hash_mask_image_field(log, "after", "content", salt="s3cr3t")
    row = h.select("after.content").first()[0]
    assert len(row) == 64 and set(row) <= set("0123456789abcdef")


def test_partition_routing_stability(spark):
    log = _log(spark)
    a = tr.partition_routing(log, 8, "key.repo", "key.path")
    b = tr.partition_routing(log, 8, "key.repo", "key.path")
    pa = {r["lsn"]: r["__partition"] for r in a.select("lsn", "__partition").collect()}
    pb = {r["lsn"]: r["__partition"] for r in b.select("lsn", "__partition").collect()}
    assert pa == pb
    assert set(pa.values()) <= set(range(8))
    assert len(set(pa.values())) > 1


def test_transaction_metadata(spark):
    log = tr.drop_tombstones(_log(spark))
    out = tr.transaction_metadata(log)
    rows = out.select("source.txId", "lsn", "transaction.*").collect()
    by_tx: dict = {}
    for r in rows:
        by_tx.setdefault(r["txId"], []).append((r["lsn"], r["total_order"]))
    for tx, pairs in by_tx.items():
        pairs.sort()
        assert [p[1] for p in pairs] == list(range(1, len(pairs) + 1)), tx


def test_extract_changed_record_state(spark):
    log = tr.drop_tombstones(_log(spark)).filter(F.col("op") == "u")
    out = tr.extract_changed_record_state(log)
    row = out.select("__changed").first()[0]
    # updates in the fixture change commit+content (+size_bytes), never the key
    assert "commit" in row and "content" in row
    assert "repo" not in row or "path" not in row


def test_routers_and_filters(spark):
    log = _log(spark)
    routed = tr.by_logical_table_router(log, "repo_(.*)", "logical_$1")
    assert routed.select("__route").first()[0] == "logical_files"
    cbr = tr.content_based_router(
        log, "CASE WHEN op = 'd' THEN 'del' ELSE 'data' END"
    )
    routes = {
        r[0]
        for r in cbr.filter(~F.col("is_tombstone"))
        .select("__route")
        .distinct()
        .collect()
    }
    assert routes == {"del", "data"}
    filt = tr.scripting_filter(log, "op = 'c'")
    assert filt.count() == log.filter(F.col("op") == "c").count()
    tf = tr.table_filter(log, include_regex="^repo_.*")
    assert tf.count() == log.count()
    tf2 = tr.table_filter(log, exclude_regex="^repo_.*")
    assert tf2.count() == 0


def test_reselect_columns_backfills_nulls(spark):
    """ReselectColumnsPostProcessor: TOAST-elided (null) after-image
    fields are back-filled from current table state by key."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.transforms import reselect_columns

    events = spark.createDataFrame(
        [
            (1, {"repo": "r1", "path": "p1", "content": None}),
            (2, {"repo": "r1", "path": "p2", "content": "fresh"}),
            (3, {"repo": "r1", "path": "p3", "content": None}),
        ],
        "lsn: long, after: struct<repo:string,path:string,content:string>",
    )
    state = spark.createDataFrame(
        [("r1", "p1", "stored-1"), ("r1", "p2", "stored-2")],
        "repo: string, path: string, content: string",
    )
    out = {
        r["lsn"]: r["after"]["content"]
        for r in reselect_columns(events, state, ("content",)).collect()
    }
    assert out[1] == "stored-1"  # null back-filled from state
    assert out[2] == "fresh"  # present value untouched
    assert out[3] is None  # no state row -> stays null


def test_header_to_value_move_and_copy(spark):
    """HeaderToValue SMT: copy keeps header keys, move removes them."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.transforms import header_to_value

    df = spark.createDataFrame(
        [(1, {"a": "x", "b": "y"})], "id: long, headers: map<string,string>"
    )
    copied = header_to_value(df, "headers", ("a",), operation="copy").collect()[0]
    assert copied["__header_a"] == "x"
    assert set(copied["headers"]) == {"a", "b"}
    moved = header_to_value(df, "headers", ("a",), operation="move").collect()[0]
    assert moved["__header_a"] == "x"
    assert set(moved["headers"]) == {"b"}


def test_converter_registry_stays_in_plan(spark):
    """CustomConverter SPI analogue: per-column converters are Column
    expression rewrites applied to the image structs — no Python UDF
    appears in the plan."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.transforms import ConverterRegistry

    df = spark.createDataFrame(
        [
            (1, {"repo": "r", "path": "p", "lang": "py"}, None),
            (2, None, {"repo": "r", "path": "p", "lang": "md"}),
        ],
        "lsn: long, after: struct<repo:string,path:string,lang:string>, "
        "before: struct<repo:string,path:string,lang:string>",
    )
    reg = ConverterRegistry()
    reg.register("lang", lambda c: F.upper(c))
    out = reg.apply(df)
    rows = {r["lsn"]: r for r in out.collect()}
    assert rows[1]["after"]["lang"] == "PY" and rows[1]["before"] is None
    assert rows[2]["before"]["lang"] == "MD" and rows[2]["after"] is None
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_schema_change_event_filter(spark):
    from debezium_spark.operators.transforms import schema_change_event_filter

    df = spark.createDataFrame(
        [
            (1, "m", '{"change_type": "ALTER_ADD_COLUMN"}'),
            (2, "m", '{"change_type": "DROP_TABLE"}'),
            (3, "u", None),
        ],
        "lsn: long, op: string, message: string",
    )
    kept = {
        r["lsn"]
        for r in schema_change_event_filter(df, ("ALTER_ADD_COLUMN",)).collect()
    }
    assert kept == {1, 3}  # data events always pass


def test_column_filter_rebuilds_images(spark):
    """column.include/exclude.list: image structs keep only matching
    fields; key columns survive any filter."""
    from debezium_spark.operators.transforms import column_filter

    df = spark.createDataFrame(
        [
            (1, {"repo": "r", "path": "p", "commit": "c1", "content": "x"}, None),
        ],
        "lsn: long, after: struct<repo:string,path:string,commit:string,content:string>, "
        "before: struct<repo:string,path:string,commit:string,content:string>",
    )
    out = column_filter(df, exclude_regex="content")
    row = out.collect()[0]
    assert row["after"].asDict() == {"repo": "r", "path": "p", "commit": "c1"}
    assert row["before"] is None
    # include list keeps only matches + the key
    out2 = column_filter(df, include_regex="commit")
    assert set(out2.collect()[0]["after"].asDict()) == {"repo", "path", "commit"}
    # the key cannot be excluded
    out3 = column_filter(df, exclude_regex="repo|path|content")
    assert set(out3.collect()[0]["after"].asDict()) == {"repo", "path", "commit"}


def test_pg_compatible_unwrap(spark):
    """YB {value,set} cell wrappers -> plain values; set=false (column
    untouched) unwraps to NULL even when value is present."""
    from debezium_spark.operators.transforms import pg_compatible_unwrap

    df = spark.createDataFrame(
        [
            (
                1,
                {
                    "repo": "r1",
                    "commit": {"value": "abc", "set": True},
                    "content": {"value": "stale", "set": False},
                },
                None,
            )
        ],
        "lsn: long, after: struct<repo:string,"
        "commit:struct<value:string,set:boolean>,"
        "content:struct<value:string,set:boolean>>, "
        "before: struct<repo:string,"
        "commit:struct<value:string,set:boolean>,"
        "content:struct<value:string,set:boolean>>",
    )
    row = pg_compatible_unwrap(df).collect()[0]
    assert row["after"]["repo"] == "r1"  # plain field passes through
    assert row["after"]["commit"] == "abc"
    assert row["after"]["content"] is None  # unset -> NULL
    assert row["before"] is None


def test_topic_name_unicode_escape(spark):
    """UnicodeReplacementFunction semantics: minimal lowercase hex,
    00-prefixed when <= 2 digits; underscore is the escape char and
    escapes itself."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.transforms import topic_name

    df = spark.createDataFrame([("a_b$c",)], "t: string")
    out = df.select(
        topic_name("p", F.lit("s"), F.col("t"), "unicode").alias("x")
    ).collect()[0]["x"]
    assert out == "p.s.a_u005fb_u0024c"


def test_schema_name_adjust_underscore_modes(spark):
    """SchemaNameAdjuster.validFullname (SchemaNameAdjuster.java:266-309)
    byte-exact: leading digit keeps the digit after the underscore
    (the collision guard); '.' is legal in fullnames, illegal in field
    names; '' is returned unchanged."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.transforms import schema_name_adjust

    cases = [
        # (proposed, avro, avro_field)
        ("server1.public.t1", "server1.public.t1", "server1_public_t1"),
        ("9orders", "_9orders", "_9orders"),
        ("$tbl", "_tbl", "_tbl"),
        ("a-b.c", "a_b.c", "a_b_c"),
        ("_ok_9", "_ok_9", "_ok_9"),
        ("", "", ""),
        ("x y", "x_y", "x_y"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "p: string")
    got = df.select(
        "p",
        schema_name_adjust(F.col("p"), "avro").alias("a"),
        schema_name_adjust(F.col("p"), "avro_field").alias("f"),
    ).collect()
    by_p = {r["p"]: (r["a"], r["f"]) for r in got}
    for p, want_a, want_f in cases:
        assert by_p[p] == (want_a, want_f), p


def test_schema_name_adjust_unicode_modes(spark):
    """Unicode modes: underscore is the escape char (escapes itself),
    first char must be a Latin letter (no underscore), minimal
    lowercase hex 00-prefixed to >= 3 digits; no digit-preserve rule
    (UnicodeReplacementFunction + FieldName variant)."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.transforms import schema_name_adjust

    cases = [
        # (proposed, avro_unicode, avro_unicode_field)
        ("a_b", "a_u005fb", "a_u005fb"),
        ("9x", "_u0039x", "_u0039x"),
        ("a.b", "a.b", "a_u002eb"),
        ("ok9", "ok9", "ok9"),
        ("", "", ""),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "p: string")
    got = df.select(
        "p",
        schema_name_adjust(F.col("p"), "avro_unicode").alias("u"),
        schema_name_adjust(F.col("p"), "avro_unicode_field").alias("uf"),
    ).collect()
    by_p = {r["p"]: (r["u"], r["uf"]) for r in got}
    for p, want_u, want_uf in cases:
        assert by_p[p] == (want_u, want_uf), p


def test_propagate_source_metadata(spark):
    """PropagateSourceMetadataToSchemaParameter semantics
    (relational/mapping/PropagateSourceMetadataToSchemaParameter.java:
    23-57): type name upper-cased, length/scale only when the type has
    them, comment only when supplied, original name always kept (the
    avro field renamer may change the field name)."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.transforms import (
        propagate_source_metadata,
    )

    df = spark.createDataFrame(
        [(1, "x")], "id bigint, name string"
    ).select(
        "id", "name", F.col("id").cast("decimal(10,2)").alias("9amt")
    )
    out = propagate_source_metadata(
        df, comments={"name": "the name"}, name_adjust_mode="avro_field"
    )
    fields = {f.metadata.get("__debezium.source.column.name"): f for f in out.schema.fields}
    assert fields["id"].metadata["__debezium.source.column.type"] == "BIGINT"
    assert fields["name"].metadata["__debezium.source.column.type"] == "STRING"
    assert fields["name"].metadata["__debezium.source.column.comment"] == "the name"
    assert "__debezium.source.column.comment" not in fields["id"].metadata
    amt = fields["9amt"]
    assert amt.name == "_9amt"  # renamed by the avro field rule...
    assert amt.metadata["__debezium.source.column.name"] == "9amt"  # ...original kept
    assert amt.metadata["__debezium.source.column.type"] == "DECIMAL"
    assert amt.metadata["__debezium.source.column.length"] == "10"
    assert amt.metadata["__debezium.source.column.scale"] == "2"
    # values untouched
    assert out.count() == 1


def test_adjust_name_column_and_python_parity(spark):
    """adjust_name (driver-side) and schema_name_adjust (column) are
    byte-identical across all four modes over randomized BMP strings —
    one Spark job for the whole sample."""
    import random

    from pyspark.sql import functions as F

    from debezium_spark.operators.transforms import (
        adjust_name,
        schema_name_adjust,
    )

    pool = list("abzAZ09_.-$ é中ß€") + ["", "\t"]
    rng = random.Random(42)
    strings = list(
        {
            "".join(rng.choice(pool) for _ in range(rng.randint(0, 12)))
            for _ in range(200)
        }
    )
    modes = ("avro", "avro_field", "avro_unicode", "avro_unicode_field")
    df = spark.createDataFrame([(s,) for s in strings], "p: string")
    got = df.select(
        "p", *[schema_name_adjust(F.col("p"), m).alias(m) for m in modes]
    ).collect()
    for r in got:
        for m in modes:
            assert r[m] == adjust_name(r["p"], m), (m, r["p"])


def test_replica_identity_shape_modes(spark):
    """PostgresChangeRecordEmitter.java:110-118 — updates lose old
    values under CHANGE/DEFAULT; yboutput CHANGE keeps only changed
    new-image cells; DELETE before is key-only except under FULL."""
    log = tr.drop_tombstones(_log(spark, n_events=2000)).cache()
    ups = F.col("op") == "u"
    dels = F.col("op") == "d"

    full = tr.replica_identity_shape(log, "full")
    assert full.filter(ups & F.col("before").isNull()).count() == 0

    dflt = tr.replica_identity_shape(log, "default")
    assert dflt.filter(ups & F.col("before").isNotNull()).count() == 0
    # delete before image reduced to key fields
    d_rows = dflt.filter(dels)
    assert d_rows.filter(F.col("before.repo").isNull()).count() == 0
    assert d_rows.filter(F.col("before.content").isNotNull()).count() == 0
    # after images untouched
    assert dflt.filter(ups & F.col("after.content").isNull()).count() == 0

    chg = tr.replica_identity_shape(log, "change")
    assert chg.filter(ups & F.col("before").isNotNull()).count() == 0
    # sparse new image: unchanged non-key cells are nulled; key cells kept
    assert chg.filter(ups & F.col("after.repo").isNull()).count() == 0
    n_unchanged_lang = log.filter(
        ups & F.col("before.lang").eqNullSafe(F.col("after.lang"))
    ).count()
    assert (
        chg.filter(ups & F.col("after.lang").isNull()).count()
        == n_unchanged_lang
    )
    # changed cells survive verbatim
    changed = log.filter(
        ups & ~F.col("before.content").eqNullSafe(F.col("after.content"))
    ).count()
    assert (
        chg.filter(ups & F.col("after.content").isNotNull()).count()
        == changed
    )

    nothing = tr.replica_identity_shape(log, "nothing")
    assert nothing.filter((ups | dels) & F.col("before").isNotNull()).count() == 0
    assert nothing.filter(~(ups | dels) & F.col("op").isin("c", "r")).count() == \
        full.filter(F.col("op").isin("c", "r")).count()
    log.unpersist()


def test_extract_new_record_state_add_fields_and_route(spark):
    """add.fields spec parsing (rename + struct paths + prefix) and
    route.by.field (ExtractNewRecordStateConfigDefinition.java:159-185)."""
    log = _log(spark)
    flat = tr.extract_new_record_state(
        log,
        delete_mode="drop",
        add_fields=("lsn", "source.txId:TX", "source.snapshot"),
        route_by_field="lang",
    )
    assert {"__lsn", "__TX", "__source_snapshot", "topic"} <= set(flat.columns)
    row = flat.orderBy("__lsn").first()
    src = (
        log.filter((F.col("lsn") == row["__lsn"]) & ~F.col("is_tombstone"))
        .select("source.txId", "after.lang")
        .first()
    )
    assert row["__TX"] == src["txId"]
    assert row["topic"] == src["lang"]
    # custom prefix
    flat2 = tr.extract_new_record_state(
        log, add_fields=("lsn",), add_fields_prefix="meta_"
    )
    assert "meta_lsn" in flat2.columns


def test_replica_identity_autoset_per_table(spark):
    """replica.identity.autoset.values — per-table-regex identity
    application, reference grammar and one-match rule
    (ReplicaIdentityMapper.java:30-31,56-60)."""
    log = tr.drop_tombstones(_log(spark, n_events=2000))
    # split the single-table log into two logical tables by key parity
    two = log.withColumn(
        "source",
        F.col("source").withField(
            "table",
            F.when(
                F.xxhash64(F.coalesce("after.repo", "before.repo")) % 2 == 0,
                "public.repo_files",
            ).otherwise("public.repo_meta"),
        ),
    ).cache()
    out = tr.apply_replica_identity_autoset(
        two,
        "public\\.repo_files:FULL,public\\.repo_meta:NOTHING",
        default_mode="change",
    )
    ups = F.col("op") == "u"
    files = out.filter(F.col("source.table") == "public.repo_files")
    meta = out.filter(F.col("source.table") == "public.repo_meta")
    assert files.filter(ups & F.col("before").isNull()).count() == 0
    assert meta.filter(ups & F.col("before").isNotNull()).count() == 0
    # unmatched table keeps the default (change): sparse update images
    dflt = tr.apply_replica_identity_autoset(
        two, "public\\.repo_files:FULL", default_mode="change"
    ).filter(F.col("source.table") == "public.repo_meta")
    n_unchanged = two.filter(
        ups
        & (F.col("source.table") == "public.repo_meta")
        & F.col("before.lang").eqNullSafe(F.col("after.lang"))
    ).count()
    assert dflt.filter(ups & F.col("after.lang").isNull()).count() == n_unchanged

    # grammar: INDEX maps to key-only DEFAULT; junk entries dropped
    specs = tr.parse_replica_identity_autoset(
        "a\\.b:INDEX idx_pk, c\\.d:full, junk, e\\.f:NOTHING"
    )
    assert [(m, i) for _, m, i in specs] == [
        ("index", "idx_pk"), ("full", None), ("nothing", None),
    ]
    # one-match rule
    import pytest as _pytest
    overlapping = tr.parse_replica_identity_autoset(
        "public\\..*:FULL,public\\.repo_files:NOTHING"
    )
    with _pytest.raises(ValueError, match="More than one"):
        tr.find_replica_identity(overlapping, "public.repo_files")
    two.unpersist()


def test_replica_identity_autoset_rejects_bad_default(spark):
    log = tr.drop_tombstones(_log(spark, n_events=200))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown replica identity"):
        tr.apply_replica_identity_autoset(log, "", default_mode="bogus")


def test_extract_new_record_state_tombstone_mode(spark):
    """delete.tombstone.handling.mode=tombstone
    (DefaultDeleteHandlingStrategy.java:58-76): deletes become
    key-populated, value-NULL tombstone rows; incoming envelope
    tombstones pass through in the same shape; nothing is dropped."""
    log = _log(spark)
    flat = tr.extract_new_record_state(log, delete_mode="tombstone")
    assert flat.count() == log.count()  # tombstones kept, deletes kept
    tombs = flat.filter(F.col("content").isNull())
    n_d = log.filter(F.col("op") == "d").count()
    n_ts = log.filter(F.col("is_tombstone")).count()
    assert tombs.count() == n_d + n_ts
    # every tombstone-shaped row still carries its key
    assert tombs.filter(
        F.col("repo").isNull() | F.col("path").isNull()
    ).count() == 0
    # non-delete rows are the plain after-image unwrap
    live = flat.filter(F.col("__op").isin("c", "u", "r"))
    assert live.filter(F.col("content").isNull()).count() == 0


def test_extract_new_record_state_rewrite_with_tombstone(spark):
    """delete.tombstone.handling.mode=rewrite-with-tombstone: the
    rewrite output PLUS one tombstone row per delete (__deleted NULL on
    the tombstone — it has no value image)."""
    log = _log(spark)
    flat = tr.extract_new_record_state(
        log, delete_mode="rewrite-with-tombstone"
    )
    n_d = log.filter(F.col("op") == "d").count()
    n_data = log.filter(~F.col("is_tombstone")).count()
    assert flat.count() == n_data + n_d
    rewrites = flat.filter(F.col("__deleted") == True)  # noqa: E712
    assert rewrites.count() == n_d
    # rewrites keep the before image's content; tombstones are bare keys
    assert rewrites.filter(F.col("content").isNull()).count() == 0
    tombs = flat.filter(F.col("__deleted").isNull())
    assert tombs.count() == n_d
    assert tombs.filter(F.col("content").isNotNull()).count() == 0
    assert tombs.filter(F.col("repo").isNull()).count() == 0


def test_extract_new_record_state_legacy_modes(spark):
    """LegacyDeleteHandlingStrategy.java:28-80 — the deprecated
    strategy's two independent knobs. delete.handling.mode=none ⇒
    deletes flatten to key-populated null-value rows;
    drop.tombstones=false ⇒ incoming envelope tombstones pass through
    as key + all-NULL rows under ANY mode."""
    log = _log(spark)
    n_d = log.filter(F.col("op") == "d").count()
    n_ts = log.filter(F.col("is_tombstone")).count()
    n_data = log.filter(~F.col("is_tombstone")).count()

    # legacy none + drop.tombstones=true (the legacy default)
    flat = tr.extract_new_record_state(
        log, delete_mode="none", keep_tombstones=False
    )
    assert flat.count() == n_data
    null_val = flat.filter(F.col("content").isNull())
    assert null_val.count() == n_d  # exactly the flattened deletes
    assert null_val.filter(
        F.col("repo").isNull() | F.col("path").isNull()
    ).count() == 0

    # legacy none + drop.tombstones=false: tombstones ride along too
    flat2 = tr.extract_new_record_state(
        log, delete_mode="none", keep_tombstones=True
    )
    assert flat2.count() == n_data + n_ts
    assert flat2.filter(F.col("content").isNull()).count() == n_d + n_ts

    # legacy rewrite + drop.tombstones=false: rewrite rows keep their
    # before image with __deleted=true; pass-through tombstones carry
    # NULL __deleted (no value image to stamp) and bare keys
    flat3 = tr.extract_new_record_state(
        log, delete_mode="rewrite", keep_tombstones=True
    )
    assert flat3.count() == n_data + n_ts
    tombs = flat3.filter(F.col("__deleted").isNull())
    assert tombs.count() == n_ts
    assert tombs.filter(F.col("content").isNotNull()).count() == 0
    assert tombs.filter(F.col("repo").isNull()).count() == 0
    assert flat3.filter(F.col("__deleted") == True).count() == n_d  # noqa: E712

    # legacy drop + drop.tombstones=false: deletes gone, tombstones kept
    flat4 = tr.extract_new_record_state(
        log, delete_mode="drop", keep_tombstones=True
    )
    assert flat4.count() == n_data - n_d + n_ts
    assert flat4.filter(F.col("__op").isNull()).count() == n_ts

    # keep_tombstones=None preserves each Default mode's retention,
    # and legacy "none" follows drop.tombstones=true (drop) by default
    assert (
        tr.extract_new_record_state(log, delete_mode="drop").count()
        == n_data - n_d
    )
    assert (
        tr.extract_new_record_state(log, delete_mode="tombstone").count()
        == log.count()
    )
    assert (
        tr.extract_new_record_state(log, delete_mode="none").count()
        == n_data
    )


def test_smt_predicate_gate(spark):
    """Kafka Connect predicate gating
    (org.apache.kafka.connect.transforms.predicates.*): an SMT fires
    only on records matching its predicate; negate flips it; NULL
    predicate input is a non-match; row-dropping SMTs drop only among
    the matched records."""
    log = tr.drop_tombstones(_log(spark))
    log = log.withColumn(
        "topic",
        F.concat(F.lit("server1.db."), F.col("source.table")),
    ).withColumn(
        "headers",
        F.when(
            F.col("op") == "u",
            F.create_map(F.lit("trace"), F.lit("t1")),
        ).otherwise(F.create_map().cast("map<string,string>")),
    )

    # RecordIsTombstone on a tombstone-bearing slice: mask content only
    # on tombstones' siblings — use op='d' rows via negate-composition
    mask = lambda d: d.withColumn("content", F.lit("***"))

    # TopicNameMatches: full-match anchoring (Connect uses
    # java.util.regex matches()) — a prefix alone must NOT match
    out = tr.apply_with_predicate(
        log, mask, tr.predicate_topic_name_matches("server1\\.db\\..*")
    )
    assert out.filter(F.col("content") != "***").count() == 0
    out2 = tr.apply_with_predicate(
        log, mask, tr.predicate_topic_name_matches("server1")
    )
    assert out2.filter(F.col("content") == "***").count() == 0

    # HasHeaderKey: only the op='u' records carry the header
    out3 = tr.apply_with_predicate(
        log, mask, tr.predicate_has_header_key("trace")
    )
    n_u = log.filter(F.col("op") == "u").count()
    assert out3.filter(F.col("content") == "***").count() == n_u
    # negate flips the gate
    out4 = tr.apply_with_predicate(
        log, mask, tr.predicate_has_header_key("trace"), negate=True
    )
    assert (
        out4.filter(F.col("content") == "***").count()
        == log.count() - n_u
    )

    # row-dropping SMT under a gate: the Filter drops only matched rows
    drop_all = lambda d: d.filter(F.lit(False))
    out5 = tr.apply_with_predicate(
        log, drop_all, tr.predicate_has_header_key("trace")
    )
    assert out5.count() == log.count() - n_u

    # NULL predicate input = non-match (null topic)
    log_null = log.withColumn(
        "topic", F.when(F.col("op") == "c", F.col("topic"))
    )
    out6 = tr.apply_with_predicate(
        log_null, mask, tr.predicate_topic_name_matches(".*")
    )
    n_c = log.filter(F.col("op") == "c").count()
    assert out6.filter(F.col("content") == "***").count() == n_c

    # SMT-added columns are NULL on pass-through records
    add_col = lambda d: d.withColumn("routed", F.lit("x"))
    out7 = tr.apply_with_predicate(
        log, add_col, tr.predicate_has_header_key("trace")
    )
    assert out7.filter(F.col("routed").isNull()).count() == log.count() - n_u
