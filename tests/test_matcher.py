"""Matcher parity: PrefixDict ≡ AhoCorasick ≡ reference TriedTree."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lacspark.matcher import AhoCorasick, PrefixDict

from .conftest import load_reference_module

ALPHA = "百度家高科技公司abc"


def build(words):
    pd_, ac = PrefixDict(), AhoCorasick()
    for w in words:
        pd_.add(w)
        ac.add(w)
    ac.finalize()
    return pd_, ac


def test_readme_example_spans():
    # /root/reference/python/LAC/prefix_tree.py:83-91 __main__ case
    words = ["百度", "家", "家家", "高科技", "技公", "科技", "科技公司"]
    text = "百度是家高科技公司"
    pd_, ac = build(words)
    expect = [(text[b:e]) for b, e in pd_.search(text)]
    # greedy keep-iff-extends: 科技公司 (ends at 9) wins over 技公
    assert expect == ["百度", "家", "高科技", "科技公司"]
    assert ac.search(text) == pd_.search(text)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(ALPHA, min_size=1, max_size=4), min_size=1, max_size=8),
       st.text(ALPHA, min_size=0, max_size=30))
def test_matchers_agree(words, text):
    pd_, ac = build(words)
    assert pd_.search(text) == ac.search(text)
    assert pd_.search_all(text) == ac.search_all(text)


@pytest.mark.parametrize("seed", range(5))
def test_parity_vs_reference_triedtree(seed):
    ref = load_reference_module("prefix_tree")
    rng = random.Random(seed)
    words = ["".join(rng.choices(ALPHA, k=rng.randint(1, 4)))
             for _ in range(rng.randint(1, 15))]
    tree = ref.TriedTree()
    mine, _ = build(words)
    for w in words:
        tree.add_word(w)
    for _ in range(200):
        text = "".join(rng.choices(ALPHA, k=rng.randint(0, 40)))
        assert mine.search(text) == [tuple(x) for x in tree.search(text)]
        assert mine.search_all(text) == [tuple(x) for x in tree.search_all(text)]
