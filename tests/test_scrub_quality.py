"""Value-level tests for the scrub (PII/normalization), quality-rule,
decontamination, incremental-dedup, and corpus-mixing operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jurimetria_etl_spark.operators import decontaminate as DC
from jurimetria_etl_spark.operators import quality as QL
from jurimetria_etl_spark.operators import scrub as SC
from jurimetria_etl_spark.operators.dedup import dedup_incremental, fingerprint
from jurimetria_etl_spark.operators.sampling import mix_corpora, mixture_plan


# ───────────────────────────── scrub ───────────────────────────────────────
def _redact_one(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(SC.redact_pii("t").alias("r")).first()["r"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("mail a.b+c@x.co.br end", "mail <EMAIL> end"),
        ("see https://x.y/z?a=1&b=2 end", "see <URL> end"),
        ("cpf 123.456.789-01 ok", "cpf <CPF> ok"),
        ("cnpj 12.345.678/0001-95 ok", "cnpj <CNPJ> ok"),
        ("tel (85) 99999-1234 fim", "tel <PHONE> fim"),
        ("tel 85 9999-1234 fim", "tel <PHONE> fim"),
        ("proc 0000001-02.2024.8.06.0001 ok", "proc <CNJ> ok"),
        # URL wins over the email embedded in it
        ("go https://a.b/c?u=x@y.zz now", "go <URL> now"),
        ("clean text stays", "clean text stays"),
    ],
)
def test_redact_pii_categories(spark, raw, expected):
    assert _redact_one(spark, raw) == expected


def test_pii_counts_respect_priority(spark):
    # the email inside the URL must count as URL only
    df = spark.createDataFrame(
        [("https://a.b/?u=x@y.zz and real@mail.com",)], "text string"
    )
    row = SC.add_pii_counts(df).first()
    assert row["n_url"] == 1
    assert row["n_email"] == 1  # only the standalone one


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Ação\tJudiciária  DE  Fortaleza ",)], "t string")
    out = df.select(SC.normalize_text("t").alias("n")).first()["n"]
    assert out == "acao judiciaria de fortaleza"


def test_scrub_documents_in_place_and_out_col(spark):
    df = spark.createDataFrame([(1, "mail a@b.cc")], "id long, text string")
    assert SC.scrub_documents(df).first()["text"] == "mail <EMAIL>"
    out = SC.scrub_documents(df, out_col="clean").first()
    assert out["text"] == "mail a@b.cc" and out["clean"] == "mail <EMAIL>"


# ─────────────────────────── quality rules ─────────────────────────────────
GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs to the "
    "river bank where a boat is waiting for the long trip home tonight "
    "with friends of the family and a warm meal is ready for everyone"
)


def _rules_row(spark, text: str):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return QL.add_quality_rules(df).first()


def test_quality_metrics_on_prose(spark):
    r = _rules_row(spark, GOOD)
    assert r["n_words"] == len(GOOD.split())
    assert 3.0 <= r["mean_word_len"] <= 5.0
    assert r["alpha_word_frac"] == 1.0
    assert r["n_stopwords"] >= 2
    assert r["dup_line_frac"] == 0.0
    assert r["symbol_word_ratio"] == 0.0


def test_quality_metrics_on_portuguese_prose(spark):
    """r8 verdict task 8: the reference's corpus is accented Portuguese —
    pin the word metrics on it so a tokenizer/regex change cannot
    silently regress the domain.  Every word here is alphabetic,
    including the accent-only 'é' and 'às' (the old [A-Za-z] class
    counted them as non-alpha)."""
    pt = (
        "A ação de indenização é movida às partes que não têm uma "
        "decisão para o processo com os documentos do órgão público"
    )
    r = _rules_row(spark, pt)
    assert r["n_words"] == len(pt.split())
    assert r["alpha_word_frac"] == 1.0
    assert r["symbol_word_ratio"] == 0.0


def test_lang_id_detects_portuguese(spark):
    """Language-ID over the reference's own language: a Portuguese
    sentence must come back 'pt', and the English/fr/es/de verdicts
    must be unchanged by the new list (pt markers are disjoint)."""
    from jurimetria_etl_spark.operators.text import lang_id

    rows = [
        (1, "a sentença que não foi proferida para o réu com os autos do processo"),
        (2, "the quick brown fox is one of the animals in the story"),
        (3, "le chat et la souris sont des animaux est une histoire"),
        (4, "el perro y los gatos las casas una es en madrid"),
        (5, "der hund und die katze das haus ist ein nicht"),
        (6, "zzz qqq xxx"),  # no stopword hits anywhere
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select("doc_id", lang_id("text").alias("lang")).collect()
    }
    assert got == {1: "pt", 2: "en", 3: "fr", 4: "es", 5: "de", 6: "und"}


def test_quality_score_language_parameter(spark):
    """quality_score(lang=) scores the natural-language term on the
    corpus's own stopwords: Portuguese prose gets full stopword credit
    under 'pt' but near-zero under the default 'en'; the other two
    terms are language-neutral so the delta isolates the stopword
    floor.  Unknown languages fail loudly."""
    import pytest as _pytest

    from jurimetria_etl_spark.operators.text import quality_score

    pt = (
        "uma decisão que não foi proferida para o réu com os autos "
        "do processo que correm para a vara com os prazos do recurso"
    )
    df = spark.createDataFrame([(1, pt)], "doc_id long, text string")
    row = df.select(
        quality_score("text").alias("en_q"),
        quality_score("text", lang="pt").alias("pt_q"),
    ).first()
    assert row["pt_q"] > row["en_q"]
    with _pytest.raises(ValueError, match="lang="):
        df.select(quality_score("text", lang="xx"))


def test_quality_empty_doc_fails_not_nulls_through(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = QL.add_quality_rules(df).first()
    assert r["mean_word_len"] is None  # NULL-propagating division
    assert df.select(QL.passes_quality("text").alias("p")).first()["p"] is False


def test_dup_line_fraction(spark):
    text = "line one\nline one\nline two\nline one"
    r = _rules_row(spark, text)
    assert r["dup_line_frac"] == 0.5  # 4 lines, 2 distinct


def test_bullet_and_ellipsis_line_fractions(spark):
    text = "- item a\n* item b\nplain line\nread more..."
    r = _rules_row(spark, text)
    assert r["bullet_line_frac"] == 0.5
    assert r["ellipsis_line_frac"] == 0.25


def test_top_ngram_char_fraction_repeated_text(spark):
    # "spam spam spam spam" — top 2-gram "spam spam" occurs 3×, len 9;
    # text len 19 → 27/19 can exceed 1 for degenerate repeats; just pin
    # the exact fold value
    r = _rules_row(spark, "spam spam spam spam")
    assert r["top_2gram_char_frac"] == round(3 * 9 / 19, 6)


def test_top_ngram_fold_matches_naive_count(spark):
    # fold-over-sorted-array must equal max over distinct grams of cnt·len
    texts = [
        "a b a b a c",
        "x y z x y z x y",
        "one two three four",
        "w w w w w",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["f"]
        for r in df.select(
            "doc_id",
            F.round(QL.top_ngram_char_fraction("text", 2), 6).alias("f"),
        ).collect()
    }
    for i, t in enumerate(texts):
        ws = t.split()
        grams = [" ".join(ws[j : j + 2]) for j in range(len(ws) - 1)]
        best = max(grams.count(g) * len(g) for g in set(grams))
        assert got[i] == round(best / len(t), 6), t


def test_quality_filter_splits(spark):
    df = spark.createDataFrame(
        [(1, GOOD), (2, "short"), (3, "1 2 3 4 5 " * 20)],
        "doc_id long, text string",
    )
    kept = QL.quality_filter(df, min_words=10).select("doc_id")
    assert [r["doc_id"] for r in kept.collect()] == [1]  # 2: too short; 3: no alpha


# ─────────────────────────── decontamination ───────────────────────────────
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flag_contamination_exact_and_clean(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # identical
            (2, "totally different words with no overlap here at all"),
            (3, "prefix alpha beta gamma delta epsilon suffix words"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in DC.flag_contamination(docs, bench, n=5).collect()
    }
    assert out[1]["contaminated"] and out[1]["overlap_ratio"] == 1.0
    assert not out[2]["contaminated"] and out[2]["overlap_cnt"] == 0
    assert out[3]["overlap_cnt"] == 1  # the one shared 5-gram
    assert out[3]["contaminated"]


def test_flag_contamination_short_docs_are_clean(spark):
    bench = _docs(spark, [(100, "a b c d e f")])
    docs = _docs(spark, [(1, "a b c")])  # too short for a 5-gram
    r = DC.flag_contamination(docs, bench, n=5).first()
    assert r["n_shingles"] == 0 and not r["contaminated"]
    assert r["overlap_ratio"] is None


def test_remove_contaminated_thresholds(spark):
    bench = _docs(spark, [(100, "one two three four five six seven")])
    docs = _docs(
        spark,
        [
            (1, "one two three four five six seven"),  # fully contaminated
            (2, "unrelated content that shares nothing with the benchmark"),
        ],
    )
    kept = DC.remove_contaminated(docs, bench, n=5)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    assert kept.columns == docs.columns


# ───────────────────────── incremental dedup ───────────────────────────────
def test_dedup_incremental(spark):
    seen = spark.createDataFrame(
        [("already stored doc",)], "text string"
    ).select(fingerprint("text").alias("fp"))
    new = _docs(
        spark,
        [
            (1, "already stored doc"),        # dup vs store
            (2, "Already  STORED doc"),       # dup after normalization
            (3, "fresh document"),
            (4, "fresh document"),            # in-batch dup of 3
        ],
    )
    out = dedup_incremental(new, seen)
    assert sorted(r["doc_id"] for r in out.collect())[:1] == [3] or \
        sorted(r["doc_id"] for r in out.collect()) in ([3], [4])
    assert out.count() == 1  # only one survivor of the fresh pair


# ─────────────────────────── corpus mixing ─────────────────────────────────
def test_mixture_plan_no_upsample_binding_source_whole():
    plan = mixture_plan(
        {"a": 100, "b": 100}, {"a": 0.75, "b": 0.25}, total_rows=None
    )
    # a binds: T = 100/0.75 ≈ 133; a keeps everything (one full epoch),
    # b downsamples to ~33%
    ea, ta = plan["a"]
    eb, tb = plan["b"]
    assert (ea, ta) == (1, 0)
    assert eb == 0 and 333_000 < tb < 334_000


def test_mixture_plan_upsample_epochs():
    plan = mixture_plan({"a": 10, "b": 100}, {"a": 0.5, "b": 0.5}, total_rows=100)
    ea, ta = plan["a"]  # target 50 from 10 rows → 5 full epochs
    assert ea == 5 and ta == 0
    assert plan["b"][0] == 0  # target 50 from 100 rows → fraction only


def test_mixture_plan_rejects_empty_weighted_source():
    with pytest.raises(ValueError, match="no rows"):
        mixture_plan({"a": 100}, {"a": 0.5, "missing": 0.5})


def test_mix_corpora_downsample_proportions(spark):
    rows = [(i, f"src{i % 2}", f"doc {i}") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mix_corpora(df, {"src0": 0.8, "src1": 0.2})
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["src0"] == 200  # binding source kept whole
    assert 35 <= by_src["src1"] <= 65  # ~50 expected (hash variance)
    assert out.select(F.max("epoch")).first()[0] == 0


def test_mix_corpora_upsample_replicates_with_epochs(spark):
    rows = [(i, "small" if i < 20 else "big", "t") for i in range(220)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mix_corpora(
        df, {"small": 0.5, "big": 0.5}, total_rows=200, key_col="doc_id"
    )
    small = out.where("source = 'small'")
    # target 100 from 20 rows → 5 full epochs exactly
    assert small.count() == 100
    assert small.select(F.countDistinct("epoch")).first()[0] == 5
    # every (doc_id, epoch) pair unique — replication, not duplication
    assert small.select("doc_id", "epoch").distinct().count() == 100


def test_mix_corpora_drops_unweighted_sources(spark):
    rows = [(i, f"src{i % 3}", "t") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mix_corpora(df, {"src0": 1.0})
    assert out.select("source").distinct().collect()[0][0] == "src0"
    assert out.count() == 10


def test_word_metrics_split_on_whitespace_runs(spark):
    """r8 review (verified live pre-fix): a single-space split merged
    'cat\\nthe' into one token, undercounting words and stopwords on
    multi-line prose."""
    from jurimetria_etl_spark.operators.quality import (
        stopword_count,
        word_count,
    )

    df = spark.createDataFrame(
        [(1, "the cat\nthe dog sat of in is to a and")], "id long, t string"
    )
    row = df.select(
        word_count("t").alias("wc"), stopword_count("t").alias("sc")
    ).first()
    assert row["wc"] == 11
    assert row["sc"] == 8


def test_lang_id_null_text_is_undetermined(spark):
    """r8 review (verified live pre-fix): NULL text fell through every
    WHEN to the 'de' branch."""
    from jurimetria_etl_spark.operators.text import lang_id

    df = spark.createDataFrame([(1, None)], "id long, t string")
    assert df.select(lang_id("t").alias("l")).first()["l"] == "und"
