"""Gopher/MassiveText quality-rule semantics (operators/quality_rules.py)."""

from __future__ import annotations

from explora_kafka_spark.operators import quality_rules as QR


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )


# ---------------------------------------------------------------------------
# ngram_repetition
# ---------------------------------------------------------------------------


def test_top_ngram_fraction_hand_example(spark):
    """'a b a b a' (9 norm chars): top 2-gram 'a b' occurs 2x (overlapping
    windows: a-b, b-a, a-b), 2 * 3 chars / 9 = 0.666667; top 3-gram
    'a b a' occurs 2x, 2 * 5 / 9 = 1.0 capped? no — top is a max of
    chars covered, not capped: 10/9 rounds to 1.111111."""
    out = QR.ngram_repetition(
        _docs(spark, ["a b a b a"]), top_ns=(2, 3), dup_ns=(2,)
    ).collect()[0]
    assert out["top_2gram_frac"] == round(2 * 3 / 9, 6)
    assert out["top_3gram_frac"] == round(2 * 5 / 9, 6)
    # dup over n=2: 'a b' (2x, 6 chars) + 'b a' (2x, 6 chars) = 12/9,
    # capped at 1.0
    assert out["dup_2gram_frac"] == 1.0


def test_repetition_zero_for_unique_text_and_short_docs(spark):
    out = QR.ngram_repetition(
        _docs(spark, ["w0 w1 w2 w3 w4 w5", "solo"]),
        top_ns=(2,), dup_ns=(5,),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    # all 2-grams distinct -> top covers exactly one occurrence
    assert by_id[0]["top_2gram_frac"] == round(5 / 17, 6)
    assert by_id[0]["dup_5gram_frac"] == 0.0
    # 1-token doc: too short for every n -> all zeros, row still present
    assert by_id[1]["top_2gram_frac"] == 0.0
    assert by_id[1]["dup_5gram_frac"] == 0.0


def test_repetition_flags_boilerplate_over_prose(spark):
    spam = " ".join(["buy cheap pills now"] * 10)
    prose = "the quick brown fox jumps over one lazy dog near a river bank"
    out = {
        r["doc_id"]: r
        for r in QR.ngram_repetition(_docs(spark, [spam, prose])).collect()
    }
    assert out[0]["dup_5gram_frac"] > 0.9
    assert out[1]["dup_5gram_frac"] == 0.0
    assert out[0]["top_4gram_frac"] > out[1]["top_4gram_frac"]


def test_repetition_deterministic_under_repartition(spark):
    docs = _docs(spark, ["x y x y x y z", "p q r s p q r s p q"])
    a = QR.ngram_repetition(docs).collect()
    b = QR.ngram_repetition(docs.repartition(7)).collect()
    assert a == b


# ---------------------------------------------------------------------------
# gopher_rules
# ---------------------------------------------------------------------------


def test_gopher_rules_word_count_and_stopwords(spark):
    long_ok = " ".join(["the"] + ["word"] * 60 + ["of"])
    short = "too short to pass"
    nostop = " ".join(["zzz"] * 80)
    out = {
        r["doc_id"]: r
        for r in QR.gopher_rules(
            _docs(spark, [long_ok, short, nostop])
        ).collect()
    }
    assert out[0]["ok_word_count"] and out[0]["ok_stopwords"]
    assert out[0]["passes_gopher"]
    assert not out[1]["ok_word_count"] and not out[1]["passes_gopher"]
    assert out[2]["ok_word_count"] and not out[2]["ok_stopwords"]
    assert not out[2]["passes_gopher"]


def test_gopher_rules_mean_word_len_and_alpha(spark):
    # 60 single-char words: mean len 1 -> fails the [3, 10] band
    shorty = " ".join(["a the of"] + ["x"] * 60)
    # numeric words fail the alphabetic-word fraction
    nums = " ".join(["the of a"] + ["123"] * 60)
    out = {
        r["doc_id"]: r
        for r in QR.gopher_rules(_docs(spark, [shorty, nums])).collect()
    }
    assert not out[0]["ok_mean_word_len"]
    assert out[1]["alpha_word_frac"] < QR.MIN_ALPHA_WORD_FRAC
    assert not out[1]["ok_alpha_frac"] and not out[1]["passes_gopher"]


def test_gopher_rules_symbol_ratio(spark):
    base = ["the of a"] + ["word"] * 60
    spam = " ".join(base + ["###", "so...", "hmm..."] * 5)
    clean = " ".join(base)
    out = {
        r["doc_id"]: r
        for r in QR.gopher_rules(_docs(spark, [spam, clean])).collect()
    }
    # 5*(3 hashes + 2 ellipses) = 25 symbols over 78 words > 0.1
    assert out[0]["symbol_ratio"] > QR.MAX_SYMBOL_RATIO
    assert not out[0]["ok_symbol_ratio"]
    assert out[1]["symbol_ratio"] == 0.0 and out[1]["ok_symbol_ratio"]


def test_gopher_rules_shuffle_free_plan(spark):
    docs = _docs(spark, ["the of a b"])
    plan = QR.gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    # projection + the output orderBy only — no aggregate/join exchanges
    assert "Join" not in plan and "HashAggregate" not in plan


# ---------------------------------------------------------------------------
# filter_pipeline
# ---------------------------------------------------------------------------


def _good_text(seed=0):
    # 60+ distinct-ish english words, stopword-rich, no repetition
    words = [f"word{seed}x{i}" for i in range(60)]
    return "the quick brown fox " + " ".join(words) + " of a lazy dog"


def test_filter_pipeline_keeps_clean_doc_and_orders_reasons(spark):
    docs = _docs(spark, [
        _good_text(),                 # 0: clean -> keep
        _good_text(),                 # 1: exact dup of 0 -> exact_dup
        "too short",                  # 2: fails gopher (word count)
        " ".join(["buy pills now"] * 40),  # 3: repetition (+maybe more)
    ])
    out = {r["doc_id"]: r for r in QR.filter_pipeline(docs).collect()}
    assert out[0]["keep"] and out[0]["drop_reasons"] == ""
    assert not out[1]["keep"] and "exact_dup" in out[1]["drop_reasons"]
    assert "gopher" in out[2]["drop_reasons"]
    assert "repetition" in out[3]["drop_reasons"]
    # fixed reason order: exact_dup < lang < gopher < repetition
    for r in out.values():
        stages = [s for s in r["drop_reasons"].split(",") if s]
        order = ["exact_dup", "lang", "gopher", "repetition"]
        assert stages == [s for s in order if s in stages]


def test_filter_pipeline_language_gate(spark):
    # french markers dominate -> pred 'fr' -> lang reason fires
    fr = " ".join(["le la les de et un une est"] * 10 + ["mot"] * 20)
    out = QR.filter_pipeline(_docs(spark, [fr])).collect()[0]
    assert not out["keep"] and "lang" in out["drop_reasons"]


def test_filter_pipeline_keep_iff_no_reasons(spark):
    docs = _docs(spark, [_good_text(i) for i in range(5)] + ["dup dup"] * 2)
    for r in QR.filter_pipeline(docs).collect():
        assert r["keep"] == (r["drop_reasons"] == "")


# ---------------------------------------------------------------------------
# quality_logit (the classifier tier)
# ---------------------------------------------------------------------------


def test_quality_logit_hand_example(spark):
    # "The cat sat.": norm 12 chars, 3 tokens, 1 punct, 1 stopword ->
    # 8_500_000 + 6*(1000000//3) - 8*(1000000//12) + 3000*3
    #   - 2*((1000000*10)//3) = 3_175_668 (>= 0 -> keep)
    # "!!! ??? ###": 11 chars, 3 tokens, 9 punct, 0 stopwords ->
    # 8_500_000 - 8*(9000000//11) + 9000 - 2*(9000000//3) = -4_036_448
    out = {r["doc_id"]: (r["logit_mu"], r["keep"])
           for r in QR.quality_logit(
               _docs(spark, ["The cat sat.", "!!! ??? ###"])).collect()}
    assert out[0] == (3_175_668, True)
    assert out[1] == (-4_036_448, False)


def test_quality_logit_monotone_in_stopword_density(spark):
    # same token count and char profile, more stopwords -> higher logit
    out = {r["doc_id"]: r["logit_mu"]
           for r in QR.quality_logit(
               _docs(spark, ["the of and to", "cat dog pig hen"])).collect()}
    assert out[0] > out[1]


def test_quality_logit_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [(r["doc_id"], r["logit_mu"], r["keep"])
           for r in QR.quality_logit(docs).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM"
                f" '{sf_dir}/documents.parquet'")
    want = [(int(a), int(b), bool(c)) for a, b, c in
            con.execute(QR.quality_logit_sql()).fetchall()]
    assert got == want
    kept = sum(1 for _, _, k in got if k)
    assert 0 < kept < len(got)  # a real mixed verdict, not a constant


def test_filter_pipeline_full_appends_classifier_reason(spark):
    # 60 words, 50 distinct non-repeating + periodic stopwords: passes
    # every tier; the short punct-heavy doc fails several tiers with
    # `classifier` LAST in the fixed reason order
    words, good_words = [a + b + s for a in "bcdfg" for b in "aeiou"
                         for s in ("ing", "ery")], []
    for i, w in enumerate(words):
        good_words.append(w)
        if i % 5 == 4:
            good_words.append("the")
    good = " ".join(good_words)
    out = {r["doc_id"]: (r["keep"], r["drop_reasons"])
           for r in QR.filter_pipeline_full(
               _docs(spark, [good, "!!! ??? ###"])).collect()}
    assert out[0] == (True, "")
    assert out[1][0] is False
    assert out[1][1].endswith("classifier")
    assert "gopher" in out[1][1]


def test_filter_pipeline_full_matches_duckdb_oracle(spark, sf_dir):
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [(r["doc_id"], r["keep"], r["drop_reasons"])
           for r in QR.filter_pipeline_full(docs).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM"
                f" '{sf_dir}/documents.parquet'")
    want = [(int(a), bool(b), c) for a, b, c in
            con.execute(QR.filter_pipeline_full_sql()).fetchall()]
    assert got == want
    assert any(k for _, k, _ in got) and not all(k for _, k, _ in got)


def test_drop_reason_profile_counts_every_firing_tier(spark, sf_dir):
    """Counts reconcile with the verdict: each reason's count equals
    the docs whose trail contains it; (kept) equals the keep count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v = QR.filter_pipeline_full(docs).collect()
    prof = {r["reason"]: r["n_docs"]
            for r in QR.drop_reason_profile(docs).collect()}
    assert prof["(kept)"] == sum(1 for r in v if r["keep"])
    for reason in ("classifier", "gopher", "lang", "repetition"):
        want = sum(1 for r in v
                   if reason in r["drop_reasons"].split(","))
        assert prof.get(reason, 0) == want


def test_gopher_rule_impact_reconciles_with_flags(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    flags = QR.gopher_rules(docs).collect()
    imp = {r["rule"]: (r["n_failing"], r["n_sole_blocker"])
           for r in QR.gopher_rule_impact(docs).collect()}
    assert set(imp) == {f[3:] for f in QR.GOPHER_FLAGS}
    for f in QR.GOPHER_FLAGS:
        failing = sum(1 for r in flags if not r[f])
        sole = sum(1 for r in flags if not r[f]
                   and all(r[o] for o in QR.GOPHER_FLAGS if o != f))
        assert imp[f[3:]] == (failing, sole)
        assert sole <= failing


# ---------------------------------------------------------------------------
# round-11: edu tier + disagreement audit
# ---------------------------------------------------------------------------


def _edu_mu_py(text: str) -> int:
    """Pure-python mirror of edu_tier's integer recurrence."""
    import re

    norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9 ]", " ",
                                      text.lower())).strip()
    toks = norm.split(" ") if norm else []
    nt, nc = len(toks), len(norm)
    uq = len(set(toks))
    dg = sum(c.isdigit() for c in norm)
    st = sum(t in QR.STOPWORDS for t in toks)
    return (QR.EDU_W0
            + QR.EDU_W_UNIQ * ((1_000_000 * uq) // max(nt, 1))
            + QR.EDU_W_AWL * ((1_000_000 * (nc - (nt - 1))) // max(nt, 1))
            + QR.EDU_W_DIGIT * ((1_000_000 * dg) // max(nc, 1))
            + QR.EDU_W_STOP * ((1_000_000 * st) // max(nt, 1)))


def test_edu_tier_hand_value(spark):
    texts = ["the quick brown foxes jumped over 12 lazy dogs",
             "the the the the the"]
    out = {r["doc_id"]: r for r in QR.edu_tier(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        mu = _edu_mu_py(t)
        assert out[i]["edu_mu"] == mu
        # Spark div truncates toward zero; negatives clamp to 0 anyway
        trunc = int(mu / QR.EDU_TIER_STEP)
        assert out[i]["tier"] == min(QR.EDU_TIERS, max(0, trunc))


def test_edu_tier_clamps_and_repetition_penalty(spark):
    # pure stopword filler should land at tier 0; rich vocabulary with
    # long words and digits climbs tiers
    low = "the and of to a in is it the and of to a in is it"
    high = ("thermodynamics 1824 entropy carnot 1850 clausius "
            "statistical 1877 boltzmann formulation 1902 gibbs")
    out = {r["doc_id"]: r["tier"]
           for r in QR.edu_tier(_docs(spark, [low, high])).collect()}
    assert out[0] == 0
    assert out[1] >= 3


def test_edu_web_disagreement_counts_consistent(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog " * 8,
        "alpha beta gamma delta " * 10,
        "the and of " * 30,
        "photosynthesis chlorophyll 680 " * 12,
    ]
    docs = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in enumerate(texts)],
        "doc_id bigint, text string, source string")
    web = {r["doc_id"]: r["keep"]
           for r in QR.quality_logit(docs).collect()}
    edu = {r["doc_id"]: r["tier"] >= 3
           for r in QR.edu_tier(docs).collect()}
    out = {r["source"]: r
           for r in QR.edu_web_disagreement(docs).collect()}
    for src in ("s0", "s1"):
        ids = [i for i in range(4) if f"s{i % 2}" == src]
        r = out[src]
        assert r["n_docs"] == len(ids)
        assert r["n_web_keep"] == sum(web[i] for i in ids)
        assert r["n_edu_keep"] == sum(edu[i] for i in ids)
        assert r["n_web_only"] == sum(web[i] and not edu[i] for i in ids)
        assert r["n_edu_only"] == sum(edu[i] and not web[i] for i in ids)
