"""DAG segmenter + mixed-granularity encoder parity vs the reference."""

from __future__ import annotations

import random

import pytest

from lacspark import RESOURCE_DIR
from lacspark.encoding import Encoder, load_kv
from lacspark.segmenter import DagSegmenter

from .conftest import load_reference_module

ALPHA = "百度家高科技公司中国北京大学生数据分析abc012 "


@pytest.fixture(scope="module")
def seg():
    freq = load_kv(str(RESOURCE_DIR / "small_seg.dic"), delimiter=" ",
                   value_func=int)
    return DagSegmenter(freq)


@pytest.fixture(scope="module")
def ref_seg(tmp_path_factory):
    mod = load_reference_module("segment")
    return mod.Segment(str(RESOURCE_DIR / "small_seg.dic"))


def test_ascii_run_buffering(seg):
    assert seg.cut("abc123 def") == ["abc123", " ", "def"]
    # 'data' is a dict word → the DAG cuts it out of the ASCII run
    assert seg.cut("spark2data") == ["spark2", "data"]
    assert seg.cut("xyzq01") == ["xyzq01"]


def test_dict_words_win(seg):
    out = seg.cut("百度是家高科技公司")
    assert "百度" in out and "高科技公司" in out


def test_segmenter_parity_vs_reference(seg, ref_seg):
    rng = random.Random(7)
    for _ in range(300):
        text = "".join(rng.choices(ALPHA, k=rng.randint(0, 40)))
        assert seg.cut(text) == ref_seg.fast_cut(text), repr(text)


def test_join_invariant(seg):
    rng = random.Random(11)
    for _ in range(200):
        text = "".join(rng.choices(ALPHA, k=rng.randint(0, 60)))
        assert "".join(seg.cut(text)) == text


class _Args:
    word_dict_path = str(RESOURCE_DIR / "word.dic")
    label_dict_path = str(RESOURCE_DIR / "tag.dic")
    word_rep_dict_path = str(RESOURCE_DIR / "q2b.dic")
    model = "lac"


def test_encoder_parity_vs_reference(seg):
    reader = load_reference_module("reader")
    ds = reader.Dataset(_Args())
    enc = Encoder.from_files(str(RESOURCE_DIR / "word.dic"),
                             str(RESOURCE_DIR / "q2b.dic"))
    assert enc.oov_id == ds.oov_id
    rng = random.Random(3)
    alpha = ALPHA + "ＡＢ１　數據"  # full-width + traditional for q2b
    for _ in range(300):
        text = "".join(rng.choices(alpha, k=rng.randint(0, 40)))
        segments = seg.cut(text)
        ids, lengths = enc.encode_mixed(segments)
        ref_ids, ref_lengths = ds.text_to_ids(segments)
        assert ids == ref_ids and lengths == ref_lengths, repr(text)
        assert enc.encode_chars(text) == ds.word_to_ids(text)


def test_tag_dic_alias_last_wins():
    id2label = load_kv(str(RESOURCE_DIR / "tag.dic"), key_func=int)
    labels = set(id2label.values())
    # uppercase entity labels present, lowercase aliases overridden
    for ent in ("PER", "LOC", "ORG", "TIME"):
        assert f"{ent}-B" in labels and f"{ent}-I" in labels
    for alias in ("nr", "ns", "nt", "t"):
        assert f"{alias}-B" not in labels
    assert len(id2label) == 49
