"""O1: the stdin REPL front-end, driven as a subprocess."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_lac_cli_repl():
    inp = "百度是一家高科技公司\nspark data join\n\n"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "lac_cli.py"),
         "--mode", "rank"],
        input=inp, capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stderr[-500:]
    lines = res.stdout.split("\n")
    # one output line per input line (incl. the empty one) + final \n
    assert len(lines) == 4 and lines[3] == ""
    # every token is word/tag/rank and words reassemble the input
    first = lines[0].split(" ")
    words = [t.rsplit("/", 2)[0] for t in first]
    assert "".join(words) == "百度是一家高科技公司"
    assert all(t.count("/") >= 2 for t in first)
    assert lines[2] == ""  # empty input line → empty output


def test_lac_cli_seg_mode():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "lac_cli.py"),
         "--mode", "seg"],
        input="数据分析\n", capture_output=True, text=True, timeout=120)
    assert res.returncode == 0
    out = res.stdout.strip()
    assert out.replace(" ", "") == "数据分析"
