"""Semantics of the BPE merge-apply encoding (``text_bpe_tokenize``):
the separator-wrapped symbol string must make a merge pattern match a
whole adjacent in-word symbol pair and nothing else, with left-to-right
non-overlapping application — the properties that keep the chained
``replace`` implementation equal to a real rank-ordered BPE apply."""

from pyspark.sql import functions as F

from durablestreams_spark.operators.text import _BPE_SEP, _bpe_apply, _bpe_encode

S = _BPE_SEP


def _run(spark, words, merges):
    col = _bpe_apply(_bpe_encode(F.array(*[F.lit(w) for w in words])), merges)
    return spark.range(1).select(col.alias("e")).collect()[0]["e"]


def _symbols(enc):
    return [w.strip(S).split(S + S) for w in enc.split(" ")] if enc else []


def test_encode_wraps_each_char(spark):
    enc = spark.range(1).select(
        _bpe_encode(F.array(F.lit("ab"), F.lit("c"))).alias("e")
    ).collect()[0]["e"]
    assert enc == f"{S}a{S}{S}b{S} {S}c{S}"


def test_left_to_right_non_overlapping(spark):
    # 'aaa' + merge (a,a) -> [aa, a], never [a, aa] or [aa, aa]
    assert _symbols(_run(spark, ["aaa"], ["aa"])) == [["aa", "a"]]
    # four a's -> two clean merges
    assert _symbols(_run(spark, ["aaaa"], ["aa"])) == [["aa", "aa"]]


def test_merge_never_crosses_word_boundary(spark):
    assert _symbols(_run(spark, ["ab", "c"], ["bc"])) == [["a", "b"], ["c"]]


def test_merged_symbol_is_atomic(spark):
    # after (a,b) -> 'ab', a later (b,c) merge must NOT match the 'b'
    # inside the merged symbol
    assert _symbols(_run(spark, ["abc"], ["ab", "bc"])) == [["ab", "c"]]
    # rank order decides: (b,c) first leaves the 'a' alone
    assert _symbols(_run(spark, ["abc"], ["bc", "ab"])) == [["a", "bc"]]


def test_single_char_words_pass_through(spark):
    assert _symbols(_run(spark, ["a"], ["aa"])) == [["a"]]


def test_dotall_wraps_line_separator_chars(spark):
    # U+2028 is not \s in Java or RE2, so it survives inside words;
    # without (?s) Java's dot skips it (RE2's does not) and the engine
    # under-counts symbols vs the oracle.
    enc = (
        spark.range(1)
        .select(_bpe_encode(F.array(F.lit("a b"))).alias("e"))
        .collect()[0]["e"]
    )
    assert enc == f"{S}a{S}{S} {S}{S}b{S}"


def test_bpe_train_merges_chain_into_multichar_symbols(spark, tmp_path):
    """The iterative trainer's whole point vs one-pass pair induction:
    a later round must be able to merge a SYMBOL produced by an earlier
    round.  Corpus of 'aab' words: round 1 merges (a,a) (tie with (a,b)
    broken by pair order), round 2 must merge ('aa','b') -> 'aab'."""
    from durablestreams_spark.operators.text import text_bpe_train

    df = spark.createDataFrame(
        [(i, "aab aab") for i in range(40)], "doc_id long, text string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = text_bpe_train(spark, str(tmp_path)).orderBy("rank").collect()
    assert (rows[0]["sym_a"], rows[0]["sym_b"]) == ("a", "a")
    assert (rows[1]["sym_a"], rows[1]["sym_b"], rows[1]["merged"]) == (
        "aa",
        "b",
        "aab",
    )
