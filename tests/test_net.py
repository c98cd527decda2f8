"""GRU-CRF decode: Viterbi vs brute force; batching invariances."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from lacspark import RESOURCE_DIR
from lacspark.net import BiGruCrf
from lacspark.tagscheme import (LAC_LABELS, SEG_LABELS, start_mask,
                                transition_mask)


@pytest.fixture(scope="module")
def seg_net():
    return BiGruCrf.load(str(RESOURCE_DIR / "seg_weights.npz"),
                         transition_mask(SEG_LABELS), start_mask(SEG_LABELS))


@pytest.fixture(scope="module")
def lac_net():
    return BiGruCrf.load(str(RESOURCE_DIR / "lac_weights.npz"),
                         transition_mask(LAC_LABELS), start_mask(LAC_LABELS))


def brute_force(net, emis, labels):
    """Enumerate all legal paths, return argmax path."""
    t, n = emis.shape
    tmask = transition_mask(labels)
    smask = start_mask(labels)
    best, best_path = -np.inf, None
    for path in itertools.product(range(n), repeat=t):
        score = net.w["crf_start"][path[0]] + smask[path[0]] + emis[0, path[0]]
        for i in range(1, t):
            score += net.w["crf_trans"][path[i - 1], path[i]] + \
                tmask[path[i - 1], path[i]] + emis[i, path[i]]
        score += net.w["crf_stop"][path[-1]]
        if score > best:
            best, best_path = score, list(path)
    return best_path


@pytest.mark.parametrize("seq_len", [1, 2, 3, 4])
def test_viterbi_vs_bruteforce_seg(seg_net, seq_len):
    rng = np.random.default_rng(5)
    for _ in range(10):
        ids = rng.integers(0, seg_net.w["emb"].shape[0], seq_len)
        padded, lens = seg_net._pad([ids])
        emis = seg_net._emissions(padded, lens)[0, :seq_len]
        got = seg_net._viterbi(emis[None, :, :], np.array([seq_len]))[0]
        assert list(got) == brute_force(seg_net, emis, SEG_LABELS)


def test_viterbi_vs_bruteforce_lac_short(lac_net):
    rng = np.random.default_rng(6)
    for seq_len in (1, 2):
        ids = rng.integers(0, lac_net.w["emb"].shape[0], seq_len)
        padded, lens = lac_net._pad([ids])
        emis = lac_net._emissions(padded, lens)[0, :seq_len]
        got = lac_net._viterbi(emis[None, :, :], np.array([seq_len]))[0]
        assert list(got) == brute_force(lac_net, emis, LAC_LABELS)


def test_no_illegal_transitions(lac_net):
    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, lac_net.w["emb"].shape[0], rng.integers(1, 60))
            for _ in range(50)]
    for path in lac_net.decode(seqs):
        labels = [LAC_LABELS[i] for i in path]
        assert not labels[0].endswith("-I")
        for prev, cur in zip(labels, labels[1:]):
            if cur.endswith("-I"):
                assert prev[:-2] == cur[:-2] and prev[-1] in "BI"


def test_batching_invariance(lac_net):
    """Decoding rows together or one-by-one gives identical paths —
    padding/masking must not leak across rows (the property that makes
    Spark partitioning irrelevant to results)."""
    rng = np.random.default_rng(8)
    seqs = [rng.integers(0, lac_net.w["emb"].shape[0], rng.integers(0, 120))
            for _ in range(40)]
    together = lac_net.decode(seqs)
    single = [lac_net.decode([s])[0] for s in seqs]
    for a, b in zip(together, single):
        assert np.array_equal(a, b)
    # rank head too
    ranks_together = lac_net.rank(seqs, together)
    for i, s in enumerate(seqs):
        one = lac_net.rank([s], [together[i]])[0]
        assert np.array_equal(ranks_together[i], one)
