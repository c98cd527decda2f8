"""Coarse DAG segmenter (the reference's ``fast_cut``).

Transcribes the semantics of /root/reference/python/LAC/segment.py:
32-118 — a unigram Viterbi over a prefix-dict DAG, scored by
``log(trie_value or 1) - log(total_count)`` where the trie value for a
full dictionary word is its *length* (prefix_tree.py:31 stores
``len(word)``), ties broken toward the larger end index (python
``max`` over ``(score, end)`` tuples) — plus the ASCII-run buffering:
consecutive single-char ``[a-zA-Z0-9]`` picks are merged into one
token (segment.py:102-117, the behavior that keeps English
identifiers/numbers whole).  Used in lac/rank modes only, to shorten
sequences before the tagger (mixed word/char granularity,
Changelog:2).
"""

from __future__ import annotations

import re
from math import log

_ASCII_RUN = re.compile(r"[a-zA-Z0-9]")


class DagSegmenter:
    def __init__(self, freq_words: dict[str, int]):
        """freq_words: word → count (``small_seg.dic`` contents)."""
        self.table: dict[str, int | None] = {}
        total = 0
        for word, count in freq_words.items():
            # value = word length (not count); count feeds only the
            # normalizer — segment.py:36-45 + prefix_tree.py:29-34
            self.table[word] = len(word)
            for i in range(1, len(word)):
                self.table.setdefault(word[:i], None)
            total += int(count)
        self.log_total = log(max(total, 1))

    def _ends(self, text: str, start: int) -> list[int]:
        """Inclusive end indices reachable from ``start`` (DAG row)."""
        ends = [start]
        stop = start + 1
        word = text[start:stop]
        while stop <= len(text) and word in self.table:
            if self.table[word]:
                if stop - 1 != start:
                    ends.append(stop - 1)
            stop += 1
            word = text[start:stop]
        return ends

    def cut(self, text: str) -> list[str]:
        n = len(text)
        if n == 0:
            return []
        # right-to-left DP; route[i] = (best log-score, best end index)
        route: list[tuple[float, int]] = [(0.0, 0)] * (n + 1)
        for i in range(n - 1, -1, -1):
            route[i] = max(
                (log(self.table.get(text[i:e + 1]) or 1) - self.log_total
                 + route[e + 1][0], e)
                for e in self._ends(text, i)
            )
        out: list[str] = []
        buf = []
        i = 0
        while i < n:
            end = route[i][1] + 1
            piece = text[i:end]
            if len(piece) == 1 and _ASCII_RUN.match(piece):
                buf.append(piece)
            else:
                if buf:
                    out.append("".join(buf))
                    buf = []
                out.append(piece)
            i = end
        if buf:
            out.append("".join(buf))
        return out
