"""Op-count statistics for the flagship combined step (no TPU needed).

The round-3 TPU trace showed a ~23 ms "long tail" of ~2900 small dense ops
(layout copies, reshapes, masks) — ops too small to matter individually but
expensive in aggregate (each pays dispatch + HBM round-trip). This tool
counts ops in the traced jaxpr and the lowered StableHLO of `entry()` so
tail-reduction work can be measured WITHOUT the TPU tunnel: fewer source
ops -> fewer compiled ops -> a shorter tail. (A proxy, not a substitute —
XLA fusion changes the mapping — but the trend is reliable and it runs on
CPU in seconds.)

Usage: python tools/hlo_stats.py [--top N] [--stablehlo]
"""

import argparse
import collections
import os
import re
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jaxpr_histogram(jaxpr) -> collections.Counter:
    """Count primitive applications, recursing into sub-jaxprs."""
    counts = collections.Counter()
    stack = [jaxpr]
    while stack:
        jx = stack.pop()
        for eqn in jx.eqns:
            counts[eqn.primitive.name] += 1
            for v in eqn.params.values():
                stack.extend(_sub_jaxprs(v))
    return counts


def _sub_jaxprs(v):
    out = []
    if hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):   # ClosedJaxpr
        out.append(v.jaxpr)
    elif hasattr(v, "eqns"):                               # Jaxpr
        out.append(v)
    elif isinstance(v, (tuple, list)):
        for item in v:
            out.extend(_sub_jaxprs(item))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--stablehlo", action="store_true",
                    help="also lower to StableHLO and count ops there")
    ap.add_argument("--attribute", type=str, default="",
                    help="comma-separated op kinds to attribute to source "
                         "lines (e.g. slice,concatenate)")
    args = ap.parse_args()

    import __graft_entry__ as ge

    fn, fn_args = ge.entry()
    traced = jax.make_jaxpr(fn)(*fn_args)
    hist = jaxpr_histogram(traced.jaxpr)
    total = sum(hist.values())
    print(f"jaxpr primitive applications: {total}")
    for name, n in hist.most_common(args.top):
        print(f"  {n:6d}  {name}")

    if args.attribute:
        # attribute selected op kinds to user source lines (where does the
        # dense tail come from?)
        kinds = set(args.attribute.split(","))
        locs = collections.Counter()
        stack = [traced.jaxpr]
        while stack:
            jx = stack.pop()
            for eqn in jx.eqns:
                for v in eqn.params.values():
                    stack.extend(_sub_jaxprs(v))
                if eqn.primitive.name not in kinds:
                    continue
                frame = None
                try:
                    from jax._src import source_info_util as siu
                    for fr in siu.user_frames(eqn.source_info.traceback):
                        fname = fr.file_name
                        if "/repo/" in fname and "/tools/" not in fname:
                            frame = (f"{fname.split('/repo/')[-1]}:"
                                     f"{fr.start_line}")
                            break
                except Exception:
                    pass
                if frame is None:
                    try:
                        fr = siu.user_frame(eqn.source_info.traceback)
                        if fr is not None:
                            frame = f"{fr.file_name}:{fr.start_line}"
                    except Exception:
                        pass
                locs[frame or "?"] += 1
        print(f"\ntop source lines for {sorted(kinds)}:")
        for loc, n in locs.most_common(args.top):
            print(f"  {n:6d}  {loc}")

    if args.stablehlo:
        text = jax.jit(fn).lower(*fn_args).as_text()
        ops = collections.Counter(
            m.group(1) for m in re.finditer(r"= \"?([\w.]+)\"?\(", text))
        stotal = sum(ops.values())
        print(f"\nstablehlo ops: {stotal}")
        for name, n in ops.most_common(args.top):
            print(f"  {n:6d}  {name}")


if __name__ == "__main__":
    main()
