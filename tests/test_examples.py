"""Example programs as integration smoke tests (reference: the colors
example's expected output is exactly 'red', examples/colors.rs)."""

import os
import runpy
import sys

import pytest

_EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_colors_example(capsys):
    runpy.run_path(os.path.join(_EXAMPLES, "colors.py"), run_name="__main__")
    assert capsys.readouterr().out.strip() == "red"


def test_translate_example(tmp_path, capsys, monkeypatch):
    idx = str(tmp_path / "t.idx.npz")
    monkeypatch.setattr(sys, "argv",
                        ["translate.py", "word7_en", "--index", idx,
                         "--n-words", "150"])
    runpy.run_path(os.path.join(_EXAMPLES, "translate.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    # aligned synthetic space: the same concept's fr/it words come first
    assert "fr: word7_fr" in out and "it: word7_it" in out
    # load path: second run reuses the dumped index
    monkeypatch.setattr(sys, "argv",
                        ["translate.py", "word9_en", "--index", idx])
    runpy.run_path(os.path.join(_EXAMPLES, "translate.py"),
                   run_name="__main__")
    assert "word9" in capsys.readouterr().out


def test_filtered_serving_example(capsys):
    runpy.run_path(os.path.join(_EXAMPLES, "filtered_serving.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "category-0 only:" in out and "after delete:" in out


def test_streaming_ingest_example(capsys):
    runpy.run_path(os.path.join(_EXAMPLES, "streaming_ingest.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "read-your-writes" not in out  # asserts live in the example
    assert "compacted: n=5600 pending=0" in out
    assert "doc-7" in out
