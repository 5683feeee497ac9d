"""Declarative data-quality expectations (operators/expectations.py)."""

from explora_kafka_spark.operators import expectations as EXP


def test_expect_hand_computed_fractions(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None), (4, 5.0)],
        "id bigint, v double")
    out = EXP.expect(df, [
        ("v_non_negative", "v >= 0", 500000),
        ("v_not_null", "v IS NOT NULL", 1000000),
        ("id_positive", "id > 0", 1000000),
    ]).collect()
    rows = {r["name"]: r for r in out}
    # NULL predicate = fail: 2 of 4 pass v >= 0 (NULL and -1 fail)
    assert rows["v_non_negative"]["n_pass"] == 2
    assert rows["v_non_negative"]["pass_frac_mu"] == 500000
    assert rows["v_non_negative"]["ok"]
    assert rows["v_not_null"]["pass_frac_mu"] == 750000
    assert not rows["v_not_null"]["ok"]
    assert rows["id_positive"]["ok"]
    # declaration order preserved
    assert [r["name"] for r in out] == [
        "v_non_negative", "v_not_null", "id_positive"]


def test_expect_empty_table_passes_trivially(spark):
    df = spark.createDataFrame([], "id bigint, v double")
    out = EXP.expect(df, [("anything", "v > 99", 1000000)]).collect()
    assert out[0]["n_rows"] == 0 and out[0]["ok"]


def test_expect_single_scan(spark):
    """All expectations fold into ONE aggregate — the plan contains
    exactly one scan of the source."""
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    plan = EXP.expect(df, [
        ("a", "v >= 0", 1000000),
        ("b", "id < 1000", 1000000),
        ("c", "v % 2 = 0", 1000000),
    ])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan


def test_expect_by_groups_isolate_and_order(spark):
    from explora_kafka_spark.operators import expectations as EXP

    df = spark.createDataFrame(
        [("a", 1.0), ("a", -1.0), ("b", 2.0), ("b", 3.0)],
        "src string, v double")
    out = EXP.expect_by(df, "src", [
        ("v_non_negative", "v >= 0", 600000),
        ("v_small", "v < 10", 1000000),
    ]).collect()
    rows = {(r["src"], r["name"]): r for r in out}
    assert rows[("a", "v_non_negative")]["pass_frac_mu"] == 500000
    assert not rows[("a", "v_non_negative")]["ok"]
    assert rows[("b", "v_non_negative")]["pass_frac_mu"] == 1000000
    assert rows[("b", "v_non_negative")]["ok"]
    # group-major, declaration-order within group
    assert [(r["src"], r["name"]) for r in out] == [
        ("a", "v_non_negative"), ("a", "v_small"),
        ("b", "v_non_negative"), ("b", "v_small")]
