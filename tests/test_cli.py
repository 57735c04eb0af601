"""CLI surface tests (ruvector-cli parity): create/insert/search/info/
export/import/graph-build run in-process on the forced-CPU backend."""

import json

import numpy as np

from ruvector_tpu.__main__ import main


def test_cli_full_lifecycle(tmp_path, capsys):
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    np.save(tmp_path / "v.npy", vecs)
    col = str(tmp_path / "col")

    main(["create", col, "--dim", "16"])
    main(["insert", col, "--vectors", str(tmp_path / "v.npy")])
    main(["info", col])
    out = capsys.readouterr().out
    assert '"points_count": 120' in out

    main(["search", col, "--query", json.dumps(vecs[5].tolist()), "-k", "3"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["results"][0]["score"] > 0.99        # finds itself

    # export -> import roundtrip
    main(["export", col, str(tmp_path / "exp.npz")])
    main(["import", str(tmp_path / "exp.npz"), str(tmp_path / "col2")])
    main(["info", str(tmp_path / "col2")])
    assert '"points_count": 120' in capsys.readouterr().out

    # kNN graph build from the collection
    main(["graph-build", col, str(tmp_path / "g.npz"), "--k", "8"])
    g = np.load(tmp_path / "g.npz")
    assert g["nbr_idx"].shape == (120, 8)
    assert g["nbr_mask"].min() >= 0
