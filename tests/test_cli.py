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


def test_cli_mincut(tmp_path, capsys):
    import json

    from ruvector_tpu.__main__ import main

    p = tmp_path / "edges.tsv"
    p.write_text("0 1 3\n1 2 3\n0 2 3\n3 4 3\n4 5 3\n3 5 3\n2 3 0.4\n")
    main(["mincut", str(p), "--json"])
    out = json.loads(capsys.readouterr().out.strip())
    assert abs(out["value"] - 0.4) < 1e-6
    assert out["mode"] == "global"
    assert out["cut_edges"] == [[2, 3]]
    main(["mincut", str(p), "--source", "0", "--sink", "5", "--json"])
    out2 = json.loads(capsys.readouterr().out.strip())
    assert out2["mode"] == "s-t" and abs(out2["value"] - 0.4) < 1e-6
