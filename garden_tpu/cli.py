"""Standalone CLI tools over the asset pipeline.

The reference ships its asset tooling as command-line binaries (layer-10
CLI tools: equi2cube + the pack/json utilities of the cfnptr submodules,
and modelc for geometry baking — SURVEY.md section 2.3). Here the same
operations are argparse subcommands over the library functions:

    python -m garden_tpu equi2cube sky.hdr out_dir --size 256
    python -m garden_tpu modelc scene.glb baked.npz
    python -m garden_tpu json2bson config.json config.bson
    python -m garden_tpu bson2json config.bson config.json
    python -m garden_tpu pack create bundle.pack assets/
    python -m garden_tpu pack list bundle.pack
    python -m garden_tpu pack extract bundle.pack textures/wood.png out/
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List


def _cmd_equi2cube(args) -> int:
    import numpy as np

    from garden_tpu.assets import images
    from garden_tpu.ops.cubemap import equi_to_cube

    path = args.input
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        equi = images.load_hdr(path)
    elif ext == ".exr":
        equi = images.load_exr(path)
    else:
        equi = images.load_image(path, linearize=True)[..., :3]
    import jax.numpy as jnp

    cube = np.asarray(equi_to_cube(jnp.asarray(equi, jnp.float32),
                                   args.size))          # (6, S, S, 3)
    os.makedirs(args.out_dir, exist_ok=True)
    names = ["px", "nx", "py", "ny", "pz", "nz"]
    base = os.path.splitext(os.path.basename(path))[0]
    for i, face in enumerate(names):
        out = os.path.join(args.out_dir, f"{base}_{face}")
        if args.float:
            np.save(out + ".npy", cube[i])
        else:
            ldr = (np.clip(cube[i] / (1.0 + cube[i]), 0, 1) ** (1 / 2.2))
            images.save_png(out + ".png", (ldr * 255).astype(np.uint8))
    print(f"wrote 6 faces to {args.out_dir}")
    return 0


def _cmd_modelc(args) -> int:
    """Bake glTF/GLB/OBJ geometry into a renderer-ready .npz (the modelc
    role: one decode at build time, zero parsing at load time)."""
    import numpy as np

    ext = os.path.splitext(args.input)[1].lower()
    if ext in (".gltf", ".glb"):
        from garden_tpu.assets.gltf import load_gltf
        meshes = load_gltf(args.input)
    elif ext == ".obj":
        from garden_tpu.assets.model import load_obj
        meshes = [load_obj(args.input)]
    else:
        print(f"unsupported model format: {ext}", file=sys.stderr)
        return 2
    arrays = {}
    for i, m in enumerate(meshes):
        arrays[f"mesh{i}_positions"] = m.positions
        arrays[f"mesh{i}_normals"] = m.normals
        arrays[f"mesh{i}_uvs"] = m.uvs
        arrays[f"mesh{i}_indices"] = m.indices
    np.savez_compressed(args.output, count=len(meshes), **arrays)
    tris = sum(int(m.indices.shape[0]) for m in meshes)
    print(f"baked {len(meshes)} meshes, {tris} triangles -> {args.output}")
    return 0


def _cmd_json2bson(args) -> int:
    from garden_tpu.assets import bson
    bson.json2bson(args.input, args.output)
    print(f"{args.input} -> {args.output}")
    return 0


def _cmd_bson2json(args) -> int:
    from garden_tpu.assets import bson
    bson.bson2json(args.input, args.output)
    print(f"{args.input} -> {args.output}")
    return 0


def _cmd_pack(args) -> int:
    from garden_tpu.assets.pack import PackReader, PackWriter

    if args.action == "create":
        w = PackWriter(args.pack)
        root = args.source or args.name
        if not root:
            print("pack create needs a source directory", file=sys.stderr)
            return 2
        n = 0
        for dirpath, _, files in os.walk(root):
            for fn in sorted(files):
                full = os.path.join(dirpath, fn)
                name = os.path.relpath(full, root).replace(os.sep, "/")
                w.add_file(name, full)
                n += 1
        w.finish()
        print(f"packed {n} items -> {args.pack}")
        return 0
    r = PackReader(args.pack)
    if args.action == "list":
        for name in r.names():
            print(name)
        return 0
    if args.action == "extract":
        data = r.read(args.name)
        out = os.path.join(args.dest or ".", args.name)
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "wb") as f:
            f.write(data)
        print(f"{args.name}: {len(data)} bytes -> {out}")
        return 0
    return 2


def _cmd_scene(args) -> int:
    """Validate + pretty-print a .scene JSON (round-trip through the
    serializer's JSON layer)."""
    with open(args.input) as f:
        doc = json.load(f)
    ents = doc.get("entities", [])
    systems = set()
    for e in ents:
        systems.update(k for k in e if k != "uid")
    print(f"{args.input}: {len(ents)} entities, "
          f"components: {', '.join(sorted(systems)) or '(none)'}")
    return 0


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="garden_tpu",
        description="garden-tpu asset pipeline CLI (SURVEY.md layer 10)")
    sub = p.add_subparsers(dest="cmd", required=True)

    e2c = sub.add_parser("equi2cube",
                         help="equirect panorama -> 6 cubemap faces")
    e2c.add_argument("input")
    e2c.add_argument("out_dir")
    e2c.add_argument("--size", type=int, default=256)
    e2c.add_argument("--float", action="store_true",
                     help="write HDR .npy faces instead of tonemapped PNGs")
    e2c.set_defaults(fn=_cmd_equi2cube)

    mc = sub.add_parser("modelc", help="bake glTF/GLB/OBJ -> .npz geometry")
    mc.add_argument("input")
    mc.add_argument("output")
    mc.set_defaults(fn=_cmd_modelc)

    jb = sub.add_parser("json2bson", help="JSON -> BSON")
    jb.add_argument("input")
    jb.add_argument("output")
    jb.set_defaults(fn=_cmd_json2bson)

    bj = sub.add_parser("bson2json", help="BSON -> JSON")
    bj.add_argument("input")
    bj.add_argument("output")
    bj.set_defaults(fn=_cmd_bson2json)

    pk = sub.add_parser("pack", help="GPK1 archive create/list/extract")
    pk.add_argument("action", choices=("create", "list", "extract"))
    pk.add_argument("pack", nargs="?")
    pk.add_argument("name", nargs="?")
    pk.add_argument("dest", nargs="?")
    pk.add_argument("--source", default=None,
                    help="source directory for 'create'")
    pk.set_defaults(fn=_cmd_pack)

    sc = sub.add_parser("scene", help="inspect a .scene JSON")
    sc.add_argument("input")
    sc.set_defaults(fn=_cmd_scene)
    return p


def main(argv: List[str] = None) -> int:
    args = make_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
