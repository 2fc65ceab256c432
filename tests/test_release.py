"""End-to-end corpus release: clean -> leak-free split -> hive write."""

import glob
import json
import os

import pyarrow.parquet as pq


def test_release_corpus_end_to_end(ray_session, tmp_path):
    from kgray.release import release_corpus

    out = str(tmp_path / "rel")
    m = release_corpus("/root/testdata/sf0.001", out)

    # hive layout + manifest agree with the written data
    splits = sorted(
        os.path.basename(p).split("=")[1]
        for p in glob.glob(f"{out}/docs/split=*")
    )
    assert splits == sorted(m["splits"])
    t = pq.ParquetDataset(f"{out}/docs").read()
    assert t.num_rows == sum(s["docs"] for s in m["splits"].values())
    assert t.num_rows > 0

    ids = t["doc_id"].to_pylist()
    assert len(ids) == len(set(ids))  # exactly one split per doc
    assert all(i % 97 != 0 for i in ids)  # benchmark holdout excluded
    assert all(n >= 10 for n in t["n_tokens"].to_pylist())  # token floor

    doc = json.load(open(f"{out}/_release.json"))
    assert doc["splits"] == m["splits"]
    assert doc["recipe"]["split_key"].startswith("ngram-0.5")


def test_release_cli(ray_session, tmp_path, capsys):
    import json

    from kgray.__main__ import main

    out = str(tmp_path / "cli_rel")
    assert main(["--type=release", "--sf-dir=/root/testdata/sf0.001",
                 f"--out={out}"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(rep["splits"]) <= {"train", "val", "test"}
    assert os.path.isdir(f"{out}/docs/split=train")
