"""Subword tokenizer: greedy longest-match semantics, determinism,
trainer tie-breaks, and Spark-UDF ≡ pure-python parity."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lacspark.subword import SubwordTokenizer, default_tokenizer, train_bpe


def test_greedy_longest_match_prefers_longest():
    tok = SubwordTokenizer(["a", "b", "ab", "abc", "c"])
    assert tok.tokenize_word("abc") == ["abc"]
    assert tok.tokenize_word("abab") == ["ab", "ab"]
    # greedy, not optimal: "abca" -> abc + a (never backtracks)
    assert tok.tokenize_word("abca") == ["abc", "a"]


def test_oov_chars_fall_back_and_count_as_unk():
    tok = SubwordTokenizer(["he", "llo"])
    assert tok.tokenize_word("hello!") == ["he", "llo", "!"]
    n_sub, n_unk = tok.counts("hello! hello")
    assert (n_sub, n_unk) == (5, 1)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_characters=" "),
               min_size=0, max_size=40))
def test_concat_invariant_any_word(word):
    """Pieces always reassemble the word exactly (single-char
    fallback guarantees progress), for ANY unicode input."""
    tok = default_tokenizer()
    assert "".join(tok.tokenize_word(word)) == word


def test_trainer_is_deterministic_and_tiebreaks_lexicographically():
    texts = ["ab ab ba ba", "ab ba"]
    v1 = train_bpe(texts, n_merges=2)
    v2 = train_bpe(list(texts), n_merges=2)
    assert v1 == v2
    # 'ab' and 'ba' both occur 3 times; lexicographic tie-break
    # merges ('a','b') first
    assert "ab" in v1


def test_vocab_fixture_loaded_and_nonempty():
    tok = default_tokenizer()
    assert len(tok.vocab) > 50
    assert tok.max_len >= 2  # real merges happened


def test_spark_udf_matches_python_twin(spark):
    from pyspark.sql import functions as F

    from lacspark.spark.subword import with_subword_counts

    rows = [(0, "the table scan was slow"), (1, ""),
            (2, "日本語 mixed WITH unknowns !!"), (3, None),
            (4, "a " * 50)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: (r["__sw"].n_subwords, r["__sw"].n_unk)
           for r in with_subword_counts(df).collect()}
    tok = default_tokenizer()
    for i, t in rows:
        assert got[i] == tok.counts(t or ""), (i, t)


def test_pack_sequences_bpe_offsets_are_exclusive_prefix_sums(spark):
    from lacspark.queries import SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        ((r.lang, r.doc_id), (r.n_subwords, r.stream_offset, r.pack_id))
        for r in SPARK_QUERIES["pack_sequences_bpe"](spark, sf).collect())
    run: dict[str, int] = {}
    for (lang, _doc), (n, off, pid) in rows:
        expect = run.get(lang, 0)
        assert off == expect and pid == off // 512
        run[lang] = expect + n
