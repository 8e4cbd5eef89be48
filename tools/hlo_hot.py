"""Rank ops in the TPU-OPTIMIZED HLO of the combined step by byte size.

The xprof per-op table names hot ops only by HLO opcode (e.g. a 1.2 ms
`convert_element_type` moving 540 MB) — this tool compiles the same
combined step, walks the post-optimization HLO, and prints the largest
ops of the requested kinds WITH their op_name scope and source file:line
metadata, so every anonymous hot op in a trace can be attributed without
guessing.

Usage: PYTHONPATH=/root/.axon_site:. python tools/hlo_hot.py [kind ...]
       (default kinds: convert fusion copy transpose)
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__ as ge

DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
               "s16": 2, "u16": 2, "pred": 1, "s8": 1, "u8": 1, "f64": 8,
               "s64": 8, "u64": 8}


def shape_bytes(shape_str: str) -> int:
    """'f32[1920,1080,3]{...}' -> byte count (0 for tuples/opaque)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def main():
    kinds = sys.argv[1:] or ["convert", "fusion", "copy", "transpose"]
    step, state = ge._build(n_bodies=10240, width=1920, height=1080,
                            grid_dim=64)

    def stepped(s, i):
        b = s["physics"]["bodies"]
        lv = b["linvel"].at[1, 0].add(1e-6 * (1.0 + i))
        s = dict(s, physics=dict(s["physics"], bodies=dict(b, linvel=lv)))
        return step(s)

    compiled = jax.jit(stepped, donate_argnums=0).lower(
        state, jnp.float32(0.0)).compile()
    text = compiled.as_text()

    # one line per instruction: %name = shape opcode(...), metadata={...}
    rows = []
    for line in text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\S+) ([\w\-]+)\(", line)
        if not m:
            continue
        name, shape, opcode = m.groups()
        if not any(k in opcode for k in kinds):
            continue
        meta = re.search(r'op_name="([^"]*)"', line)
        src = re.search(r'source_file="([^"]*)".*source_line=(\d+)', line)
        rows.append((shape_bytes(shape), opcode, name,
                     (meta.group(1) if meta else "?")[:80],
                     f"{src.group(1).split('/')[-1]}:{src.group(2)}"
                     if src else "?"))
    rows.sort(reverse=True)
    print(f"{'MB':>8s} {'opcode':<22s} {'op_name (scope)':<82s} source")
    for b, opcode, name, scope, src in rows[:40]:
        print(f"{b/1e6:>8.1f} {opcode:<22s} {scope:<82s} {src}")


if __name__ == "__main__":
    main()
