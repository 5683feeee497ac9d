"""Hand-pins for the round-11 admission-gate compositions
(expect_embeddings projection, near_dup_cluster_profile)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from explora_kafka_spark.operators import expectations as EXP
from explora_kafka_spark.operators.dedup import near_dup_cluster_profile


def test_embedding_gate_flags_bad_vectors(spark):
    import __spark_entry__ as E

    rows = [
        (1, [1.0 / math.sqrt(2)] * 2 + [0.0] * 62),   # unit, dim 64
        (2, [0.0] * 64),                              # zero vector
        (3, [0.5] * 32),                              # wrong dim
        (4, [float("nan")] + [0.0] * 63),             # NaN + zeros
        # NaN component but otherwise unit-norm: ONLY the no_nan
        # expectation catches this vector (see band math below)
        (5, [float("nan")] + [1.0 / math.sqrt(63)] * 63),
        # out-of-envelope magnitudes: pre-ADVICE-r11 these overflowed
        # the int64 µunit square under ANSI; now they fold to norm 0
        # and are flagged by finite_envelope instead of throwing
        (6, [float("inf")] + [0.0] * 63),
        (7, [1.0e5] * 64),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    stats = emb.select(
        F.size("embedding").alias("dim"),
        F.expr(E._EMB_STATS_SPARK).alias("norm2_mu"),
        F.expr("exists(embedding, v -> isnan(CAST(v AS DOUBLE)))")
        .alias("has_nan"),
        F.expr(E._EMB_OOB_SPARK).alias("has_oob"))
    got = {r["name"]: r for r in
           EXP.expect(stats, E._EMB_EXPECTATIONS).collect()}
    assert got["dim_is_64"]["n_pass"] == 6
    assert got["no_nan"]["n_pass"] == 5
    # finite_envelope catches NaN (4, 5), inf (6) and huge (7)
    assert got["finite_envelope"]["n_pass"] == 3
    # Spark's floor(DOUBLE)->BIGINT folds a NaN component to µunit 0
    # (the DuckDB mirror carries a matching CASE — CAST(nan AS BIGINT)
    # would THROW there), so vec 4's norm is exactly 0 and fails the
    # nonzero check, while vec 5's remaining components still sum
    # float32 storage: recompute the fold from the stored float value
    import struct as _st
    f32 = _st.unpack("f", _st.pack("f", 1.0 / math.sqrt(63)))[0]
    norm5 = 63 * math.floor(f32 * 1e6 + 0.5) ** 2
    in_band = 980_000_000_000 <= norm5 <= 1_020_000_000_000
    assert got["nonzero_vector"]["n_pass"] == 3  # vecs 1, 3, 5
    assert not got["dim_is_64"]["ok"]
    # vec 1 is in the ±2% band; vec 3 (norm 8e12) is far outside;
    # vec 5 sits in the band iff the integer math above says so —
    # documenting that only no_nan flags a NaN-but-unit vector;
    # vecs 6/7 fold to norm 0 (out of band, out of nonzero)
    assert got["unit_norm_band"]["n_pass"] == 1 + int(in_band)


def test_near_dup_cluster_profile_hand_example(spark):
    docs = spark.createDataFrame(
        [(1, "the same exact text here", "s"),
         (2, "the same exact text here", "s"),
         (3, "something entirely different", "s")],
        "doc_id long, text string, source string")
    rows = [tuple(r) for r in near_dup_cluster_profile(docs).collect()]
    # one pair group (removes 1), one singleton (removes 0)
    assert rows == [(1, 1, 1, 0), (2, 1, 2, 1)]


def test_blocklist_filter_hand_example(spark):
    from explora_kafka_spark.operators.quality_rules import blocklist_filter

    docs = spark.createDataFrame(
        [(1, "this is slow and broken text", "s1"),   # 2 distinct hits
         (2, "perfectly fine text", "s1"),            # 0 hits
         (3, "slow slow slow", "s2")],                # 1 DISTINCT hit
        "doc_id long, text string, source string")
    rows = {r["source"]: r for r in blocklist_filter(docs).collect()}
    assert rows["s1"]["n_docs"] == 2
    assert rows["s1"]["flagged_docs"] == 1
    assert rows["s1"]["total_hits"] == 2        # distinct per doc
    assert rows["s1"]["flagged_ppm"] == 500_000
    assert rows["s2"]["flagged_docs"] == 1
    assert rows["s2"]["total_hits"] == 1        # dedup'd within doc
    assert rows["s2"]["flagged_ppm"] == 1_000_000


def test_embedding_gate_dirty_input_engine_parity(spark, tmp_path):
    """The oracle must survive and MATCH on exactly the dirty inputs
    the gate exists to flag: NaN components (DuckDB CAST(nan AS
    BIGINT) would throw without the CASE fold), ±Inf and huge
    magnitudes (pre-fold, DuckDB CAST(inf AS BIGINT) and the int64
    µunit square both THROW — ADVICE r11), empty arrays (DuckDB list
    aggregates return NULL on [] without the coalesce), and wrong
    dims — checked through PARQUET, the driver's actual path (pandas
    registration maps NaN to NULL and masks the divergence)."""
    import math

    import duckdb

    import __spark_entry__ as E
    from explora_kafka_spark.operators import expectations as EXP

    rows = [
        (1, [1.0 / math.sqrt(2)] * 2 + [0.0] * 62),
        (2, [float("nan")] + [0.0] * 63),
        (3, []),
        (4, [0.5] * 32),
        (5, [float("inf")] + [0.0] * 63),
        (6, [-float("inf")] + [1.0 / math.sqrt(63)] * 63),
        (7, [1.0e5] * 64),
        (8, [-4.0e3] + [0.0] * 63),
        # NULL component (r12 review): folds to µunit 0 in the norm
        # and must flag has_oob IDENTICALLY on both engines — Spark
        # exists() propagates a NULL lambda result where DuckDB
        # list_bool_or ignores it, so the flag is NULL-total
        (9, [None] + [1.0 / math.sqrt(63)] * 63),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = str(tmp_path / "embeddings.parquet")
    emb.write.mode("overwrite").parquet(p)
    stats = spark.read.parquet(p).select(
        F.size("embedding").alias("dim"),
        F.expr(E._EMB_STATS_SPARK).alias("norm2_mu"),
        F.expr("exists(embedding, v -> isnan(CAST(v AS DOUBLE)))")
        .alias("has_nan"),
        F.expr(E._EMB_OOB_SPARK).alias("has_oob"))
    sp = [(r["name"], r["n_pass"]) for r in
          EXP.expect(stats, E._EMB_EXPECTATIONS).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM"
                f" read_parquet('{p}/*.parquet')")
    du = [(r[0], r[2]) for r in
          con.execute(E.oracle_sql()["expect_embeddings"]).fetchall()]
    assert sp == du
    assert dict(sp)["no_nan"] == 8       # only the NaN row is caught
    assert dict(sp)["finite_envelope"] == 3  # rows 2, 5-9 flagged
    # NaN+zeros, inf+zeros, huge-only all fold to norm 0; rows 6/9's
    # finite components still carry a (near-unit) norm
    assert dict(sp)["nonzero_vector"] == 4  # rows 1, 4, 6, 9

