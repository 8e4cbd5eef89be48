"""CLI tool coverage (garden_tpu/cli.py — the reference's standalone asset
tools as argparse subcommands, SURVEY.md layer 10)."""

import json
import os

import pytest

import numpy as np

from garden_tpu.cli import main


def test_pack_create_list_extract(tmp_path):
    src = tmp_path / "assets"
    (src / "textures").mkdir(parents=True)
    (src / "textures" / "a.bin").write_bytes(b"\x01\x02" * 100)
    (src / "readme.txt").write_text("hello")
    pack = str(tmp_path / "bundle.pack")

    assert main(["pack", "create", pack, str(src)]) == 0
    assert os.path.exists(pack)

    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["pack", "list", pack]) == 0
    names = set(buf.getvalue().split())
    assert names == {"textures/a.bin", "readme.txt"}

    dest = tmp_path / "out"
    assert main(["pack", "extract", pack, "textures/a.bin",
                 str(dest)]) == 0
    assert (dest / "textures" / "a.bin").read_bytes() == b"\x01\x02" * 100


def test_json_bson_roundtrip(tmp_path):
    doc = {"name": "scene", "count": 3, "pos": [1.0, 2.0, 3.0],
           "nested": {"on": True}}
    jpath = tmp_path / "doc.json"
    bpath = tmp_path / "doc.bson"
    j2path = tmp_path / "doc2.json"
    jpath.write_text(json.dumps(doc))
    assert main(["json2bson", str(jpath), str(bpath)]) == 0
    assert main(["bson2json", str(bpath), str(j2path)]) == 0
    assert json.loads(j2path.read_text()) == doc


def test_modelc_obj(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("""v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
f 1//1 2//1 3//1
""")
    out = tmp_path / "tri.npz"
    assert main(["modelc", str(obj), str(out)]) == 0
    data = np.load(out)
    assert int(data["count"]) == 1
    assert data["mesh0_positions"].shape == (3, 3)
    assert data["mesh0_indices"].shape == (1, 3)


def test_equi2cube_cli(tmp_path):
    from garden_tpu.assets.images import save_png
    equi = (np.random.default_rng(0).uniform(0, 255, (8, 16, 3))
            .astype(np.uint8))
    src = tmp_path / "sky.png"
    save_png(str(src), equi)
    out = tmp_path / "faces"
    assert main(["equi2cube", str(src), str(out), "--size", "16"]) == 0
    faces = sorted(os.listdir(out))
    assert len(faces) == 6


def test_scene_inspect(tmp_path, capsys):
    sc = tmp_path / "demo.scene"
    sc.write_text(json.dumps({"entities": [
        {"uid": 1, "transform": {"position": [0, 0, 0]}},
        {"uid": 2, "transform": {}, "rigidbody": {}},
    ]}))
    assert main(["scene", str(sc)]) == 0
    out = capsys.readouterr().out
    assert "2 entities" in out and "rigidbody" in out


def test_debugview_index(tmp_path):
    from garden_tpu.utils.debug_view import _save
    _save(np.zeros((4, 4, 3), np.uint8), str(tmp_path / "a.png"))
    (tmp_path / "stats.txt").write_text("[render]\n{'tris': 1}\n")
    assert main(["debugview", str(tmp_path)]) == 0
    html = (tmp_path / "index.html").read_text()
    assert "a.png" in html and "tris" in html


@pytest.mark.slow
def test_scene_preview(tmp_path):
    sc = tmp_path / "demo.scene"
    sc.write_text(json.dumps({"entities": [
        {"uid": 1, "transform": {"position": [0, 0, 0]},
         "rigidbody": {"shapeType": "plane", "normal": [0, 1, 0],
                       "distance": 0.0, "motionType": "static"}},
        {"uid": 2, "transform": {"position": [0, 0.5, 0]},
         "rigidbody": {"shapeType": "box", "halfExtent": [0.5, 0.5, 0.5]}},
        {"uid": 3, "transform": {"position": [0.1, 1.5, 0.0]},
         "rigidbody": {"shapeType": "sphere", "radius": 0.5}},
    ]}))
    out = tmp_path / "preview.png"
    assert main(["scene", str(sc), "--preview", str(out), "--cpu",
                 "--width", "256", "--height", "128"]) == 0
    assert out.exists() and out.stat().st_size > 1000
