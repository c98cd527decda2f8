"""The reference's own test-suite cases
(/root/reference/python/LAC/tests/lac_test.py) transcribed against
the drop-in facade: single vs batch shapes per mode, add_word
intervention, plus train round-trip through model_path."""

from __future__ import annotations

from lacspark.lac import LAC


def test_seg_single_and_batch_shapes():
    lac = LAC(mode="seg")
    text = "LAC是个优秀的分词工具"
    single = lac.run(text)
    assert isinstance(single, list)
    assert all(isinstance(w, str) for w in single)
    assert "".join(single) == text

    texts = ["LAC是个优秀的分词工具", "百度是一家高科技公司"]
    batch = lac.run(texts)
    assert len(batch) == 2
    for t, words in zip(texts, batch):
        assert "".join(words) == t


def test_lac_mode_shapes():
    lac = LAC(mode="lac")
    words, tags = lac.run("百度是一家很好的公司")
    assert len(words) == len(tags)
    assert "".join(words) == "百度是一家很好的公司"
    batch = lac.run(["百度是一家很好的公司"])
    assert batch[0][0] == words and batch[0][1] == tags


def test_rank_mode_shapes():
    lac = LAC(mode="rank")
    words, tags, ranks = lac.run("百度是一家很好的公司")
    assert len(words) == len(tags) == len(ranks)
    assert all(isinstance(r, int) for r in ranks)


def test_add_word_changes_segmentation():
    # the reference's fun_add_word case: the custom phrase must
    # surface as the dictionary units after intervention
    lac = LAC(mode="seg")
    lac.add_word("红红 火火", sep=None)
    words = lac.run("他这一生红红火火了一把")
    assert "红红" in words and "火火" in words
    assert "".join(words) == "他这一生红红火火了一把"


def test_empty_string_returns_empty():
    lac = LAC(mode="seg")
    assert lac.run("") == []
    batch = lac.run(["", "ab"])
    assert batch[0] == [] and "".join(batch[1]) == "ab"


def test_train_then_model_path_roundtrip(tmp_path):
    corpus = tmp_path / "train.txt"
    corpus.write_text("\n".join(["ab cd", "abc d"] * 5), encoding="utf-8")
    lac = LAC(mode="seg")
    res = lac.train(str(tmp_path / "model"), str(corpus), iter_num=15)
    assert res["nll_trace"][-1] < res["nll_trace"][0]
    # a NEW facade pointed at the saved dir reproduces the trained
    # engine's output (models.py:209 load_model semantics)
    reloaded = LAC(model_path=str(tmp_path / "model"), mode="seg")
    for t in ["ab cd", "zz yy"]:
        assert reloaded.run(t) == lac.run(t)
