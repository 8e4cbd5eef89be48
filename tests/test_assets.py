import json

import jax.numpy as jnp
import numpy as np
import pytest

from garden_tpu.assets import bson
from garden_tpu.assets.model import load_obj, save_obj
from garden_tpu.ops.cubemap import equi_to_cube, sample_cubemap
from garden_tpu.render.mesh import cube as make_cube


OBJ_TRI = """
v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
f 1/1 2/2 3/3
"""

OBJ_QUAD = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
"""


def test_obj_triangle_with_generated_normals():
    m = load_obj(OBJ_TRI, from_string=True)
    assert m.vertex_count == 3 and m.triangle_count == 1
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 3, atol=1e-6)
    np.testing.assert_allclose(m.uvs, [[0, 0], [1, 0], [0, 1]])


def test_obj_quad_fan_triangulation():
    m = load_obj(OBJ_QUAD, from_string=True)
    assert m.triangle_count == 2
    assert m.vertex_count == 4  # dedup


def test_obj_save_load_roundtrip(tmp_path):
    m = make_cube(0.5)
    p = str(tmp_path / "cube.obj")
    save_obj(m, p)
    m2 = load_obj(p)
    assert m2.triangle_count == m.triangle_count
    np.testing.assert_allclose(
        sorted(map(tuple, m2.positions.tolist())),
        sorted(map(tuple, m.positions.tolist())), atol=1e-5)


def test_bson_roundtrip():
    doc = {
        "entities": [
            {"components": [
                {".type": "transform", "position": [1.0, 2.0, 3.0],
                 "isActive": True, "parent": None, "count": 3}
            ]}
        ],
        "version": "1.0",
    }
    data = bson.dumps(doc)
    out = bson.loads(data)
    assert out == doc


def test_json2bson_tool(tmp_path):
    jp = str(tmp_path / "a.scene")
    bp = str(tmp_path / "a.bson")
    doc = {"entities": [{"components": [{".type": "camera", "fieldOfView": 0.9}]}]}
    with open(jp, "w") as f:
        json.dump(doc, f)
    bson.json2bson(jp, bp)
    with open(bp, "rb") as f:
        assert bson.loads(f.read()) == doc


def test_equi_to_cube_direction_colors():
    # equirect where each pixel encodes its longitude band color
    h, w = 32, 64
    equi = np.zeros((h, w, 3), np.float32)
    equi[:, : w // 2, 0] = 1.0   # west half red
    equi[:, w // 2:, 2] = 1.0    # east half blue
    cube = equi_to_cube(jnp.asarray(equi), 16)
    assert cube.shape == (6, 16, 16, 3)
    # up face mixes; +z face center: lon 0 -> x = w/2 -> blue half
    pz_center = np.asarray(cube[4, 8, 8])
    assert pz_center[2] > pz_center[0]
    # sampling matches the face it came from
    c = sample_cubemap(cube, jnp.array([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(c[0]), pz_center, atol=0.2)


def test_image_png_roundtrip(tmp_path):
    """PNG save/load through the host image pipeline (resource.cpp image
    loading analog)."""
    from garden_tpu.assets import images
    img = np.zeros((16, 16, 4), np.float32)
    img[..., 0] = np.linspace(0, 1, 16)[None, :]
    img[..., 3] = 1.0
    p = str(tmp_path / "t.png")
    images.save_png(p, img)
    back = images.load_image(p, linearize=False)
    assert back.shape == (16, 16, 4)
    np.testing.assert_allclose(back[..., 0], img[..., 0], atol=2 / 255)


def test_image_hdr_roundtrip(tmp_path):
    """Radiance .hdr reader: flat-scanline RGBE encode/decode."""
    from garden_tpu.assets import images
    h, w = 8, 8
    rgb = np.abs(np.random.default_rng(0).normal(1.0, 2.0, (h, w, 3))
                 ).astype(np.float32) + 0.1
    # encode RGBE (flat scanlines)
    maxc = rgb.max(-1)
    exp = np.ceil(np.log2(maxc)).astype(np.int32)
    scale = 256.0 / (2.0 ** exp)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = (exp + 128).astype(np.uint8)
    p = str(tmp_path / "t.hdr")
    with open(p, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
    back = images.load_hdr(p)
    assert back.shape == (h, w, 4)
    # RGBE quantization: ~1% relative
    np.testing.assert_allclose(back[..., :3], rgb, rtol=0.05, atol=0.05)


def _make_glb(pos, nrm, uv, idx):
    """Build a minimal GLB in memory for loader tests."""
    import json
    import struct
    bin_data = (pos.astype(np.float32).tobytes()
                + nrm.astype(np.float32).tobytes()
                + uv.astype(np.float32).tobytes()
                + idx.astype(np.uint16).tobytes())
    n = pos.shape[0]
    o_nrm = pos.nbytes
    o_uv = o_nrm + nrm.nbytes
    o_idx = o_uv + uv.nbytes
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": o_nrm, "byteLength": nrm.nbytes},
            {"buffer": 0, "byteOffset": o_uv, "byteLength": uv.nbytes},
            {"buffer": 0, "byteOffset": o_idx, "byteLength": idx.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": n, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": n, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": n, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123,
             "count": idx.size, "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3}]}],
    }
    j = json.dumps(doc).encode()
    j += b" " * (-len(j) % 4)
    b = bin_data + b"\0" * (-len(bin_data) % 4)
    total = 12 + 8 + len(j) + 8 + len(b)
    out = struct.pack("<4sII", b"glTF", 2, total)
    out += struct.pack("<II", len(j), 0x4E4F534A) + j
    out += struct.pack("<II", len(b), 0x004E4942) + b
    return out


def test_gltf_glb_roundtrip():
    """GLB loader (the modelc any-format converter analog, modelc.cpp)."""
    from garden_tpu.assets.gltf import load_gltf_bytes
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)
    idx = np.array([[0, 1, 2], [2, 1, 3]], np.uint16)
    glb = _make_glb(pos, nrm, uv, idx)
    meshes = load_gltf_bytes(glb)
    assert len(meshes) == 1
    m = meshes[0]
    np.testing.assert_allclose(m.positions, pos)
    np.testing.assert_allclose(m.uvs, uv)
    assert m.indices.shape == (2, 3)


def test_async_resource_pipeline(tmp_path):
    """Background loads + completion-queue drain + dedup + hot reload
    (ResourceSystem, resource.hpp:119-199, 164-168, 203)."""
    from garden_tpu.assets import images
    from garden_tpu.assets.resources import IMAGE, ResourceSystem

    img = np.zeros((8, 8, 4), np.float32)
    img[..., 1] = 0.5
    img[..., 3] = 1.0
    p = tmp_path / "tex.png"
    images.save_png(str(p), img)

    rs = ResourceSystem(root=str(tmp_path))
    events = []
    rs.on_loaded(IMAGE, lambda h: events.append(h.path))
    h1 = rs.load_image_async("tex.png", linearize=False)
    h2 = rs.load_image_async("tex.png", linearize=False)
    assert h1 is h2  # shared-resource dedup
    h3 = rs.load_bytes_async("tex.png")
    done = rs.wait_all()
    assert h1.ready and h1.value.shape == (8, 8, 4)
    assert h3.ready and isinstance(h3.value, bytes)
    assert events == ["tex.png"]

    # missing file: error recorded, pipeline survives
    bad = rs.load_image_async("missing.png")
    rs.wait_all()
    assert not bad.ready and "FileNotFoundError" in bad.error

    # hot reload picks up changed content
    img[..., 1] = 1.0
    images.save_png(str(p), img)
    rs.reload("tex.png")
    rs.wait_all()
    assert abs(float(h1.value[0, 0, 1]) - 1.0) < 2 / 255
    rs.shutdown()


def test_exr_roundtrip(tmp_path):
    """Minimal EXR reader: uncompressed FLOAT and ZIPS HALF scanlines
    (resource.hpp:136-151 lists exr among supported image formats)."""
    import struct
    import zlib

    import numpy as np

    from garden_tpu.assets.images import load_exr, load_image

    def write_exr(path, img, compression=0, half=False):
        h, w, _ = img.shape
        ptype = 1 if half else 2
        px = np.float16 if half else np.float32
        chans = b""
        for name in (b"B", b"G", b"R"):
            chans += (name + b"\x00" + struct.pack("<i", ptype)
                      + b"\x00\x00\x00\x00" + struct.pack("<ii", 1, 1))
        chans += b"\x00"

        def attr(name, atype, payload):
            return (name + b"\x00" + atype + b"\x00"
                    + struct.pack("<i", len(payload)) + payload)

        dw = struct.pack("<4i", 0, 0, w - 1, h - 1)
        hdr = b"\x76\x2f\x31\x01" + struct.pack("<i", 2)
        hdr += attr(b"channels", b"chlist", chans)
        hdr += attr(b"compression", b"compression", bytes([compression]))
        hdr += attr(b"dataWindow", b"box2i", dw)
        hdr += attr(b"displayWindow", b"box2i", dw)
        hdr += attr(b"lineOrder", b"lineOrder", b"\x00")
        hdr += attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        hdr += attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
        hdr += attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        hdr += b"\x00"
        blocks = []
        for y in range(h):
            line = b""
            for c in (2, 1, 0):  # B, G, R (alphabetical channel order)
                line += img[y, :, c].astype(px).tobytes()
            if compression == 2:  # ZIPS: predictor + interleave + deflate
                arr = np.frombuffer(line, np.uint8)
                half_n = (len(arr) + 1) // 2
                inter = np.empty(len(arr), np.uint8)
                inter[:half_n] = arr[0::2]
                inter[half_n:] = arr[1::2]
                d = inter.astype(np.int64)
                enc = np.empty_like(d)
                enc[0] = d[0]
                enc[1:] = (d[1:] - d[:-1] + 128) % 256
                line = zlib.compress(enc.astype(np.uint8).tobytes())
            blocks.append(struct.pack("<ii", y, len(line)) + line)
        base = len(hdr) + 8 * h
        offsets = b""
        o = base
        for bl in blocks:
            offsets += struct.pack("<q", o)
            o += len(bl)
        with open(path, "wb") as f:
            f.write(hdr + offsets + b"".join(blocks))

    img = (np.random.RandomState(0).rand(6, 9, 3) * 4.0).astype(np.float32)
    p1 = str(tmp_path / "f32.exr")
    write_exr(p1, img, compression=0, half=False)
    got = load_exr(p1)
    np.testing.assert_allclose(got[..., :3], img, rtol=1e-6)

    p2 = str(tmp_path / "h16.exr")
    write_exr(p2, img, compression=2, half=True)
    got = load_image(p2)   # via the extension dispatch
    np.testing.assert_allclose(got[..., :3], img, rtol=2e-3)
