"""DSIR importance weights (operators/dsir.py): gram stream shape,
hand-computed µbit scores vs an independent Python model, empty-doc
contract, and DuckDB oracle parity."""

import hashlib
import math

import duckdb

from explora_kafka_spark.operators.dsir import (
    dsir_select, dsir_select_sql, dsir_weights, dsir_weights_sql)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint")


def _py_model(rows, target_lang="en", B=256):
    """Independent reference: same normalize/grams/bucket/smoothing."""
    def grams(text):
        toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    raw, tgt = [0] * B, [0] * B
    per_doc = []
    for text, lang in rows:
        bs = [bucket(g) for g in grams(text)]
        per_doc.append(bs)
        for b in bs:
            raw[b] += 1
            if lang == target_lang:
                tgt[b] += 1
    Tr, Tt = sum(raw), sum(tgt)
    lam = [math.floor((math.log2((tgt[b] + 1) / (Tt + B))
                       - math.log2((raw[b] + 1) / (Tr + B))) * 1e6 + 0.5)
           for b in range(B)]
    return [(i, len(bs), sum(lam[b] for b in bs) if bs else None)
            for i, bs in enumerate(per_doc)]


def test_matches_python_model_on_hand_corpus(spark):
    rows = [("the cat sat", "en"), ("the cat", "en"),
            ("der hund lief", "de"), ("the hund", "de"), ("", "en")]
    got = [(r["doc_id"], r["n_grams"], r["log_ratio_mu"])
           for r in dsir_weights(_docs(spark, rows)).collect()]
    assert got == _py_model(rows)


def test_gram_stream_is_unigrams_plus_bigrams(spark):
    # "a b c" -> a, b, c, "a b", "b c" = 5 grams; blank doc -> 0 + NULL
    out = {r["doc_id"]: (r["n_grams"], r["log_ratio_mu"])
           for r in dsir_weights(_docs(spark, [("a b c", "en"),
                                               ("  ", "de")])).collect()}
    assert out[0][0] == 5
    assert out[1] == (0, None)


def test_target_like_docs_score_higher(spark):
    # raw corpus is half en / half de; an en-vocab doc must outscore a
    # de-vocab doc under the en-target LM
    rows = [("the quick brown fox", "en"), ("the lazy brown dog", "en"),
            ("der schnelle braune fuchs", "de"),
            ("der faule braune hund", "de")]
    mu = {r["doc_id"]: r["log_ratio_mu"]
          for r in dsir_weights(_docs(spark, rows)).collect()}
    assert mu[0] > mu[2]
    assert mu[1] > mu[3]


def test_select_takes_top_by_weight_and_skips_gramless(spark):
    rows = [("the quick brown fox", "en"), ("the lazy brown dog", "en"),
            ("der schnelle braune fuchs", "de"), ("", "en")]
    docs = _docs(spark, rows)
    weights = {r["doc_id"]: r["log_ratio_mu"]
               for r in dsir_weights(docs).collect()
               if r["log_ratio_mu"] is not None}
    out = dsir_select(docs, top=2).collect()
    want = sorted(weights, key=lambda d: (-weights[d], d))[:2]
    assert [r["doc_id"] for r in out] == want
    assert [r["rank"] for r in out] == [1, 2]
    assert 3 not in {r["doc_id"] for r in out}  # gram-less never selected


def test_select_matches_duckdb_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [(r["doc_id"], r["log_ratio_mu"], r["rank"])
           for r in dsir_select(docs, top=50).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM"
                f" '{sf_dir}/documents.parquet'")
    want = [tuple(int(x) for x in row) for row in con.execute(
        dsir_select_sql(top=50)).fetchall()]
    assert got == want


def test_matches_duckdb_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [(r["doc_id"], r["n_grams"], r["log_ratio_mu"])
           for r in dsir_weights(docs).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM"
                f" '{sf_dir}/documents.parquet'")
    want = [(int(d), int(n), None if m is None else int(m))
            for d, n, m in con.execute(dsir_weights_sql()).fetchall()]
    assert got == want


def test_one_pass_weights_match_lazy_builder(spark):
    # round 14: dsir_select consumes the checkpointed one-pass twin;
    # its rows must be bit-identical to the lazy two-pass builder
    from explora_kafka_spark.operators.dsir import _weights_one_pass
    rows = [("the cat sat", "en"), ("the cat", "en"),
            ("der hund lief", "de"), ("the hund", "de"), ("", "en")]
    docs = _docs(spark, rows)
    lazy = [tuple(r) for r in dsir_weights(docs).collect()]
    one = [tuple(r) for r in _weights_one_pass(docs).collect()]
    assert one == lazy
