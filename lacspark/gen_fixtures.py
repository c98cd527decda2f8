"""Deterministic fixture generation (seed=42) → lacspark/resources/.

Produces the five dictionaries in the reference's file formats
(SURVEY.md §1.3) plus tiny seeded-random GRU-CRF weight archives of
the report.pdf §4.2 shapes scaled down (emb 32, hidden 32, 2 stacked
Bi-GRU).  The weights define the engine's ground truth: the oracle
and the Spark UDF load the same .npz, goldens derive from the oracle.

Run: ``python -m lacspark.gen_fixtures``
"""

from __future__ import annotations

import string

import numpy as np

from . import RESOURCE_DIR
from .tagscheme import LAC_LABELS, SEG_LABELS, tag_dic_lines

SEED = 42
EMB = 32
HIDDEN = 32
TAG_EMB = 16
RANK_HIDDEN = 16

# Corpus-aligned word inventory (the driver's `documents` tables use
# these tokens).  Half go in the vocab as whole words (exercising
# mixed-granularity encode), half stay char-level; an overlapping half
# goes in the DAG seg dict.
DOC_WORDS = [
    "join", "hash", "row", "batch", "scan", "customer", "column",
    "filter", "small", "slow", "merge", "order", "vector", "line",
    "data", "table", "agg", "value", "key", "stream", "window",
    "spark", "group", "part", "big", "sort", "query", "fast", "the",
    "dup", "a",
]
VOCAB_WORDS = DOC_WORDS[0::2]          # whole-word vocab entries
SEG_WORDS = DOC_WORDS[0:20]            # DAG dictionary entries

# Small CJK inventory for the q2b / CJK code paths.
CJK_CHARS = list("百度高科技公司中国北京上海大学生产品质量数据分析程序员工作时间春天花开秋风落阳新年贺词世纪创造美好共同语言模型词法断句标注")
CJK_WORDS = ["百度", "高科技", "科技", "公司", "高科技公司", "中国", "北京",
             "大学", "学生", "大学生", "数据", "分析", "程序员", "春天",
             "秋风", "新年", "贺词", "世纪", "语言", "模型"]

# Full-width → half-width ASCII + a few traditional→simplified pairs
# (q2b.dic shape, reader.py:64 / c++ lac.cpp:117-122).
TRAD_SIMP = {"數": "数", "據": "据", "質": "质", "時": "时", "員": "员",
             "語": "语", "詞": "词", "國": "国", "學": "学", "產": "产"}


def q2b_pairs() -> list[tuple[str, str]]:
    pairs = [("　", " ")]  # ideographic space → space
    for code in range(0xFF01, 0xFF5F):  # full-width ASCII block
        pairs.append((chr(code), chr(code - 0xFEE0)))
    pairs.extend(TRAD_SIMP.items())
    return pairs


def build_vocab() -> list[str]:
    chars = list(string.printable[:-5])  # ascii letters/digits/punct + space
    seen, vocab = set(), []
    for tok in chars + CJK_CHARS + VOCAB_WORDS + CJK_WORDS:
        if tok not in seen:
            seen.add(tok)
            vocab.append(tok)
    vocab.append("OOV")  # last entry, reader.py:65
    return vocab


def _gru_dir(rng, name: str, in_dim: int, hidden: int, w: dict) -> None:
    scale = 1.0 / np.sqrt(in_dim)
    w[f"{name}_wx"] = rng.normal(0, scale, (in_dim, 3 * hidden)).astype(np.float32)
    w[f"{name}_wh"] = rng.normal(0, 1.0 / np.sqrt(hidden), (hidden, 3 * hidden)).astype(np.float32)
    w[f"{name}_b"] = rng.normal(0, 0.1, 3 * hidden).astype(np.float32)


def build_weights(vocab_size: int, labels: list[str], seed_offset: int,
                  with_rank: bool) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(SEED + seed_offset)
    n_labels = len(labels)
    w: dict[str, np.ndarray] = {}
    w["emb"] = rng.normal(0, 0.5, (vocab_size, EMB)).astype(np.float32)
    for layer, in_dim in ((0, EMB), (1, 2 * HIDDEN)):
        _gru_dir(rng, f"l{layer}_fw", in_dim, HIDDEN, w)
        _gru_dir(rng, f"l{layer}_bw", in_dim, HIDDEN, w)
    w["fc_w"] = rng.normal(0, 0.2, (2 * HIDDEN, n_labels)).astype(np.float32)
    fc_b = rng.normal(0, 0.1, n_labels).astype(np.float32)
    # thin out entity emissions so mention density is plausible
    for j, lb in enumerate(labels):
        if lb[:-2] in ("PER", "LOC", "ORG", "TIME", "nz", "nw"):
            fc_b[j] -= 0.8
    w["fc_b"] = fc_b
    trans = rng.normal(0, 0.5, (n_labels, n_labels)).astype(np.float32)
    # bias toward span continuation so decoded words are multi-char
    # (random-weight stand-in for what training learns)
    for i, prev in enumerate(labels):
        for j, cur in enumerate(labels):
            if cur.endswith("-I") and prev[:-2] == cur[:-2] and \
                    prev[-1] in ("B", "I"):
                trans[i, j] += 0.9 if prev.endswith("-B") else 0.3
    w["crf_trans"] = trans
    w["crf_start"] = rng.normal(0, 0.5, n_labels).astype(np.float32)
    w["crf_stop"] = rng.normal(0, 0.5, n_labels).astype(np.float32)
    if with_rank:
        w["tag_emb"] = rng.normal(0, 0.5, (n_labels, TAG_EMB)).astype(np.float32)
        _gru_dir(rng, "r0_fw", EMB + TAG_EMB, RANK_HIDDEN, w)
        _gru_dir(rng, "r0_bw", EMB + TAG_EMB, RANK_HIDDEN, w)
        w["rank_fc_w"] = rng.normal(0, 0.2, (2 * RANK_HIDDEN, 4)).astype(np.float32)
        w["rank_fc_b"] = rng.normal(0, 0.1, 4).astype(np.float32)
    return w


CUSTOM_DICT_LINES = [
    # the four rule shapes from README.md:132-137
    "春天/SEASON",
    "花/n 开/v",
    "秋天的风",
    "落 阳",
    # single tagged english word + a split phrase, for the code corpus
    "spark/TOOL",
    "数据/DATA 分析/v",
]


def main() -> None:
    RESOURCE_DIR.mkdir(parents=True, exist_ok=True)
    vocab = build_vocab()
    rng = np.random.default_rng(SEED)

    with open(RESOURCE_DIR / "word.dic", "w", encoding="utf8") as f:
        f.writelines(f"{i}\t{tok}\n" for i, tok in enumerate(vocab))
    with open(RESOURCE_DIR / "q2b.dic", "w", encoding="utf8") as f:
        f.writelines(f"{a}\t{b}\n" for a, b in q2b_pairs())
    with open(RESOURCE_DIR / "tag.dic", "w", encoding="utf8") as f:
        f.writelines(line + "\n" for line in tag_dic_lines(LAC_LABELS))
    with open(RESOURCE_DIR / "seg_tag.dic", "w", encoding="utf8") as f:
        f.writelines(f"{i}\t{lb}\n" for i, lb in enumerate(SEG_LABELS))
    with open(RESOURCE_DIR / "small_seg.dic", "w", encoding="utf8") as f:
        for w_ in SEG_WORDS + CJK_WORDS:
            f.write(f"{w_} {int(rng.integers(1, 1000))}\n")
    with open(RESOURCE_DIR / "custom.dic", "w", encoding="utf8") as f:
        f.writelines(line + "\n" for line in CUSTOM_DICT_LINES)

    np.savez(RESOURCE_DIR / "lac_weights.npz",
             **build_weights(len(vocab), LAC_LABELS, 0, with_rank=True))
    np.savez(RESOURCE_DIR / "seg_weights.npz",
             **build_weights(len(vocab), SEG_LABELS, 1, with_rank=False))
    print(f"wrote fixtures to {RESOURCE_DIR} (vocab={len(vocab)}, "
          f"labels={len(LAC_LABELS)})")


if __name__ == "__main__":
    main()
