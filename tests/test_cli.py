"""CLI tool tests (info / validate / convert / selftest)."""

import json

import numpy as np

from instant_distance_tpu.__main__ import main
from instant_distance_tpu.config import Config
from instant_distance_tpu.models.hnsw import HnswMap


def _make_index(tmp_path):
    rng = np.random.default_rng(71)
    pts = rng.random((300, 12), dtype=np.float32)
    values = [f"v{i}" for i in range(300)]
    m = HnswMap.build(pts, values, Config(seed=71, ef_search=32))
    path = str(tmp_path / "idx.npz")
    m.dump(path)
    return path


def test_cli_info_validate_selftest(tmp_path, capsys):
    path = _make_index(tmp_path)
    assert main(["info", path]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["points"] == 300 and info["type"] == "HnswMap"

    assert main(["validate", path]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["ok"]

    assert main(["selftest", path, "--queries", "64"]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["self_top1"] > 0.9


def test_cli_convert_roundtrip(tmp_path, capsys):
    path = _make_index(tmp_path)
    bin_path = str(tmp_path / "idx.bin")
    assert main(["convert", path, bin_path]) == 0
    capsys.readouterr()
    assert main(["info", bin_path, "--dims", "12"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["points"] == 300
    assert main(["validate", bin_path, "--dims", "12"]) == 0
