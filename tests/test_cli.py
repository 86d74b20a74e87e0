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


def test_cli_build_search(tmp_path, capsys):
    rng = np.random.default_rng(73)
    pts = rng.random((256, 12), dtype=np.float32)
    vec_path = str(tmp_path / "vecs.npy")
    np.save(vec_path, pts)
    vals_path = str(tmp_path / "vals.json")
    with open(vals_path, "w") as f:
        json.dump([f"w{i}" for i in range(256)], f)
    idx_path = str(tmp_path / "built.npz")

    assert main(["build", vec_path, idx_path, "--seed", "73",
                 "--ef-construction", "32", "--values", vals_path]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["points"] == 256 and rep["format"] == "native"

    q_path = str(tmp_path / "q.npy")
    np.save(q_path, pts[:3])
    assert main(["search", idx_path, q_path, "--k", "2"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 3
    row = json.loads(lines[0])
    assert row["values"][0] == "w0" and row["distances"][0] < 1e-5

    # bincode output from the build command (extension-dispatched)
    bin_path = str(tmp_path / "built.bin")
    assert main(["build", vec_path, bin_path, "--seed", "73",
                 "--ef-construction", "32"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["format"] == "bincode"
