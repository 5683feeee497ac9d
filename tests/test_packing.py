"""Sequence packing + token-budget sampling semantics (operators/packing.py)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from explora_kafka_spark.operators import packing as P


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id: long, text: string, source: string"
    )


def test_pack_slices_tile_documents_exactly(spark):
    # "w" repeated k times pretokenizes to k BPE tokens (" w" each)
    df = _docs_df(spark, [
        (i, " ".join(["w"] * n), "s")
        for i, n in [(1, 5), (2, 12), (3, 3), (4, 30), (5, 1)]
    ])
    out = P.pack_sequences(df, budget=8, shards=1).toPandas()
    # every document's slices are contiguous, start at offset 0, and sum
    # to its token count
    tok = {1: 5, 2: 12, 3: 3, 4: 30, 5: 1}
    for doc_id, grp in out.groupby("doc_id"):
        grp = grp.sort_values("doc_offset")
        assert grp["n_slice_tokens"].sum() == tok[doc_id]
        assert grp["doc_offset"].iloc[0] == 0
        ends = grp["doc_offset"] + grp["n_slice_tokens"]
        assert (grp["doc_offset"].iloc[1:].values == ends.iloc[:-1].values).all()


def test_packs_are_full_except_the_last_per_shard(spark):
    df = _docs_df(spark, [
        (i, " ".join(["w"] * n), "s")
        for i, n in [(1, 5), (2, 12), (3, 3), (4, 30), (5, 1)]
    ])
    budget = 8
    out = P.pack_sequences(df, budget=budget, shards=1).toPandas()
    per_pack = (
        out.groupby(["shard", "pack_id"])["n_slice_tokens"].sum().reset_index()
    )
    last = per_pack.groupby("shard")["pack_id"].transform("max")
    full = per_pack[per_pack["pack_id"] != last]
    assert (full["n_slice_tokens"] == budget).all()
    # total tokens conserved: 51 tokens → packs 0..5, last holds 51 - 48
    assert per_pack["n_slice_tokens"].sum() == 51
    # within a pack, slices tile [0, fill): offsets are a prefix partition
    for (_, _), grp in out.groupby(["shard", "pack_id"]):
        grp = grp.sort_values("pack_offset")
        assert grp["pack_offset"].iloc[0] == 0
        ends = grp["pack_offset"] + grp["n_slice_tokens"]
        assert (grp["pack_offset"].iloc[1:].values == ends.iloc[:-1].values).all()


def test_pack_sharding_is_deterministic_and_partitioned(spark):
    df = _docs_df(spark, [(i, "a b c", "s") for i in range(40)])
    out1 = P.pack_sequences(df, budget=4, shards=4).toPandas()
    out2 = P.pack_sequences(df.repartition(7), budget=4, shards=4).toPandas()
    key = ["shard", "pack_id", "doc_id"]
    assert out1.sort_values(key).reset_index(drop=True).equals(
        out2.sort_values(key).reset_index(drop=True)
    )
    assert set(out1["shard"].unique()) <= set(range(4))


def test_empty_docs_are_dropped(spark):
    df = _docs_df(spark, [(1, "", "s"), (2, "  ", "s"), (3, "x", "s")])
    out = P.pack_sequences(df, budget=4, shards=1).toPandas()
    assert set(out["doc_id"]) == {3}


def test_token_budget_sample_covers_budget_minimally(spark):
    df = _docs_df(spark, [
        (i, " ".join(["w"] * 10), f"src{i % 2}") for i in range(20)
    ])
    out = P.token_budget_sample(df, {"src0": 35}).toPandas()
    assert set(out["source"]) == {"src0"}
    # smallest prefix covering 35 tokens at 10/doc = 4 docs
    assert len(out) == 4
    assert out["cum_tokens"].max() == 40
    # every kept doc STARTS inside the budget
    assert ((out["cum_tokens"] - out["n_tokens"]) < 35).all()


def test_token_budget_sample_is_stable_under_corpus_growth(spark):
    # adding docs to ANOTHER source never changes a source's sample
    base = [(i, " ".join(["w"] * 10), "a") for i in range(10)]
    extra = [(100 + i, " ".join(["w"] * 10), "b") for i in range(10)]
    s1 = P.token_budget_sample(
        _docs_df(spark, base), {"a": 55}
    ).toPandas()
    s2 = P.token_budget_sample(
        _docs_df(spark, base + extra), {"a": 55}
    ).toPandas()
    assert s1.equals(s2)


def test_pack_plan_has_single_shuffle_and_no_python_udf(spark):
    df = _docs_df(spark, [(i, "a b c", "s") for i in range(10)])
    plan = P.pack_sequences(df, budget=4, shards=2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_write_shards_layout_and_manifest(spark, tmp_path):
    from explora_kafka_spark.operators.packing import (
        pack_sequences, write_shards)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = pack_sequences(docs, budget=64, shards=4)
    write_shards(plan, str(tmp_path / "out"), packs_per_file=2)

    data = spark.read.parquet(str(tmp_path / "out" / "data"))
    # nothing lost or duplicated, and the grouping helper stays internal
    assert data.count() == plan.count()
    assert "_fg" not in data.columns
    # whole-pack files: no pack is ever split across physical files
    from pyspark.sql import functions as F
    data = data.withColumn("_file", F.input_file_name())
    split_packs = (
        data.groupBy("shard", "pack_id")
        .agg(F.countDistinct("_file").alias("nf"))
        .filter(F.col("nf") > 1).count())
    assert split_packs == 0

    manifest = spark.read.parquet(str(tmp_path / "out" / "manifest"))
    rows = {r["shard"]: r for r in manifest.collect()}
    got = plan.groupBy("shard").agg(
        F.count("*").alias("n_rows"),
        F.sum("n_slice_tokens").alias("n_tokens")).collect()
    for r in got:
        m = rows[r["shard"]]
        assert m["n_rows"] == r["n_rows"]
        assert m["n_tokens"] == r["n_tokens"]
    # n_files audits the PHYSICAL file count
    physical = {
        r["shard"]: r["nf"] for r in data.groupBy("shard").agg(
            F.countDistinct("_file").alias("nf")).collect()}
    for shard, m in rows.items():
        assert m["n_files"] == physical[shard]


# ---------------------------------------------------------------------------
# pack_docs (whole-document next-fit)
# ---------------------------------------------------------------------------


def test_pack_docs_next_fit_hand_example(spark):
    df = _docs_df(spark, [
        (i, " ".join(["w"] * n), "s")
        for i, n in [(1, 4), (2, 5), (3, 3), (4, 10), (5, 2)]
    ])
    out = P.pack_docs(df, budget=10, shards=1).toPandas()
    # next-fit over doc_id order: [4,5]=9 | +3>10 -> [3] | +10>10 -> [10]
    # | +2>10 -> [2]
    assert out["bin_id"].tolist() == [0, 0, 1, 2, 3]
    assert out["doc_id"].tolist() == [1, 2, 3, 4, 5]


def test_pack_docs_never_splits_and_respects_capacity(spark):
    df = _docs_df(spark, [
        (i, " ".join(["w"] * (3 + i % 7)), "s") for i in range(40)
    ])
    out = P.pack_docs(df, budget=16, shards=2).toPandas()
    # each doc appears exactly once (never split, never duplicated)
    assert out["doc_id"].is_unique and len(out) == 40
    fills = out.groupby(["shard", "bin_id"])["n_tokens"].sum()
    assert (fills <= 16).all()  # no oversize docs in this corpus


def test_pack_docs_oversize_doc_gets_own_bin(spark):
    df = _docs_df(spark, [
        (1, " ".join(["w"] * 4), "s"),
        (2, " ".join(["w"] * 25), "s"),  # longer than the budget
        (3, " ".join(["w"] * 4), "s"),
    ])
    out = P.pack_docs(df, budget=10, shards=1).toPandas()
    big = out[out["doc_id"] == 2]
    assert len(out[out["bin_id"] == big["bin_id"].iloc[0]]) == 1


def test_pack_docs_deterministic_under_repartition(spark):
    df = _docs_df(spark, [
        (i, " ".join(["w"] * (1 + i % 11)), "s") for i in range(60)
    ])
    a = P.pack_docs(df, budget=20, shards=4).collect()
    b = P.pack_docs(df.repartition(13), budget=20, shards=4).collect()
    assert a == b


def test_pack_docs_bins_close_only_when_next_doc_overflows(spark):
    """Next-fit property: within a shard, bin k's fill + the first doc
    of bin k+1 must exceed the budget (otherwise it wouldn't have
    closed)."""
    budget = 16
    df = _docs_df(spark, [
        (i, " ".join(["w"] * (2 + (i * 5) % 9)), "s") for i in range(50)
    ])
    out = P.pack_docs(df, budget=budget, shards=2).toPandas()
    for shard, grp in out.groupby("shard"):
        fills = grp.groupby("bin_id")["n_tokens"].sum()
        first_of_next = (
            grp.sort_values(["bin_id", "doc_id"])
            .groupby("bin_id")["n_tokens"].first()
        )
        for b in fills.index[:-1]:
            assert fills[b] + first_of_next[b + 1] > budget


def test_pack_efficiency_report_hand_values(spark):
    # one shard, budget 8, token counts 5,12,3,30,1 (total 51):
    # concat-chunk: ceil(51/8)=7 packs, capacity 56, pad 5 (final
    #   partial pack), used 51; docs spanning a cut: doc2 (5..17 spans
    #   8 and 16), doc4 (20..50 spans 24,32,40,48) -> 2 exceptions.
    # whole-doc next-fit in doc_id order: [5,(12)],[(3)+? ...] ->
    #   bins: [5]+12>8 so bin0={5} fill5; bin1={12} (oversize); 3
    #   fits? bin1 fill 12 already > start new: 12+3>8 -> bin2={3};
    #   30 oversize -> 3+30>8 -> bin3={30}; 1 -> 30+1>8 -> bin4={1}.
    #   5 bins, capacity 40, used 51, pad = (8-5)+(0)+(8-3)+(0)+(8-1)
    #   = 15, oversize bins = 2.
    df = _docs_df(spark, [
        (i, " ".join(["w"] * n), "s")
        for i, n in [(1, 5), (2, 12), (3, 3), (4, 30), (5, 1)]
    ])
    out = {r["strategy"]: r
           for r in P.pack_efficiency_report(df, budget=8,
                                             shards=1).collect()}
    cc = out["concat_chunk"]
    assert (cc["n_docs"], cc["n_packs"], cc["used_tokens"],
            cc["capacity_tokens"], cc["pad_tokens"],
            cc["n_exceptions"]) == (5, 7, 51, 56, 5, 2)
    assert cc["pad_ppm"] == 1_000_000 * 5 // 56
    wd = out["whole_doc"]
    assert (wd["n_docs"], wd["n_packs"], wd["used_tokens"],
            wd["capacity_tokens"], wd["pad_tokens"],
            wd["n_exceptions"]) == (5, 5, 51, 40, 15, 2)
    assert wd["pad_ppm"] == 1_000_000 * 15 // 40
