"""Dictionary loading + mixed-granularity id encoding.

Formats and semantics per the reference:
* k/v dict files ``id \\t token`` with last-wins on duplicate keys
  (/root/reference/python/LAC/reader.py:29-51 — the tag.dic alias
  override depends on last-wins; c++/src/lac_util.cpp:103-128 agrees).
* q2b normalization applied at lookup time, per *token* (a multi-char
  token misses the dict and passes through) — reader.py:103-111.
* mixed word/char granularity (reader.py:113-128): a segment that is
  in the vocabulary **before** q2b normalization encodes as one id and
  records its char length; otherwise it encodes per char.  The
  recorded lengths drive tag re-expansion after decode
  (models.py:154-158).
"""

from __future__ import annotations

import io


def load_kv(path: str, reverse: bool = False, delimiter: str = "\t",
            key_func=None, value_func=None) -> dict:
    """Last-wins k/v file loader (reader.py:29-51 semantics)."""
    out = {}
    with io.open(path, "r", encoding="utf8") as f:
        for line in f:
            parts = line.rstrip("\n").split(delimiter)
            if len(parts) != 2:
                continue
            k, v = (parts[1], parts[0]) if reverse else (parts[0], parts[1])
            if key_func:
                k = key_func(k)
            if value_func:
                v = value_func(v)
            out[k] = v
    return out


class Encoder:
    def __init__(self, word2id: dict[str, int], q2b: dict[str, str],
                 oov_token: str = "OOV"):
        self.word2id = word2id
        self.q2b = q2b
        self.oov_id = word2id[oov_token]

    @classmethod
    def from_files(cls, word_dic: str, q2b_dic: str) -> "Encoder":
        return cls(load_kv(word_dic, reverse=True, value_func=int),
                   load_kv(q2b_dic))

    def tokens_to_ids(self, tokens) -> list[int]:
        """q2b-normalize then vocab-lookup each token (OOV fallback)."""
        w2i, q2b, oov = self.word2id, self.q2b, self.oov_id
        return [w2i.get(q2b.get(t, t), oov) for t in tokens]

    def encode_mixed(self, segments: list[str]) -> tuple[list[int], list[int]]:
        """Mixed-granularity encode of a segmented text.

        Returns (ids, seg_lengths): one id per in-vocab segment
        (length recorded), per-char ids otherwise (length 1 each).
        """
        ids: list[int] = []
        lengths: list[int] = []
        for seg in segments:
            if seg in self.word2id:  # raw-form check precedes q2b
                ids.extend(self.tokens_to_ids([seg]))
                lengths.append(len(seg))
            else:
                ids.extend(self.tokens_to_ids(seg))
                lengths.extend([1] * len(seg))
        return ids, lengths

    def encode_chars(self, text: str) -> list[int]:
        """Char-granularity encode (seg mode; models.py:259-270)."""
        return self.tokens_to_ids(text)
