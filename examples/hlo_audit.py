"""HBM-traffic audit of a compiled attack step.

Compiles the same jitted PGD iteration `bench.py` times (DSGN headline or
Stereo R-CNN), dumps the post-optimization HLO, and prints an op census
ranked by output bytes — the methodology that found round 3's wins (layout
copies around the depth-stage transposes, f32 promotions, duplicate
convert ops, 3-operand einsums).

The census counts each op's OUTPUT buffer only: it underestimates total
traffic (operand reads are not double-counted) but ranks the movers
correctly, and the "copy/transpose/convert" categories are pure overhead a
reformulation can delete. Run on the TPU backend so the audited HLO is the
one the chip executes; compiles hit the on-disk cache if bench ran first.

Usage:
    python examples/hlo_audit.py --model dsgn [--tiny] [--top 30]
    python examples/hlo_audit.py --model dsgn --depthconv pallas
    python examples/hlo_audit.py --model srcnn --dump /tmp/srcnn.hlo
"""
from __future__ import annotations

import argparse
import collections
import re
import sys

_SHAPE_RE = re.compile(
    r"=\s+(?:\()?([a-z0-9]+)\[([0-9,]*)\][^ ]*\s+([a-z0-9_-]+)\(")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')
# leading autodiff/jit wrappers in op_name paths, e.g.
# jit(step)/jvp(transpose(...))/DSGN/Hourglass3D_0/...
_WRAPPER_RE = re.compile(r"^(jit\([^)]*\)|jvp|vjp|transpose|remat|checkpoint"
                         r"|named_scope|while|body|cond)\(?.*?\)?$")


def _module_of(op_name: str, depth: int = 2) -> str:
    """First `depth` flax-module components of an op_name path (wrapper
    frames like jit(...)/jvp(...)/transpose(...) stripped)."""
    parts = [p for p in op_name.split("/") if p]
    mods = [p for p in parts if not _WRAPPER_RE.match(p)]
    # drop the trailing primitive (conv_general_dilated, dot_general, ...)
    if len(mods) > 1:
        mods = mods[:-1]
    return "/".join(mods[:depth]) or "(top)"
_ITEMSIZE = {
    "f64": 8, "s64": 8, "u64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}


# no output buffer of their own — aliases of other ops' buffers
_ALIAS_OPS = frozenset((
    "parameter", "tuple", "get-tuple-element", "bitcast", "constant"))


def census(hlo_text: str, top: int, entry_only: bool = True):
    """Parse post-optimization HLO text -> (per-opcode totals, top ops).

    With entry_only (default), only instructions of the ENTRY computation
    are counted — post-fusion those are exactly the ops that materialize
    an HBM buffer; instructions inside `%fused_computation` bodies are
    elementwise work on registers/VMEM and would inflate the census.
    """
    by_op = collections.Counter()
    by_op_n = collections.Counter()
    by_module = collections.Counter()
    ops = []

    # pass 1: a representative op_name per non-entry computation (fusion
    # bodies) — the call-site `fusion(...)` line carries no metadata of its
    # own, so ENTRY fusions are attributed to the op_name that covers the
    # most bytes INSIDE their fused computation
    comp_name = None
    comp_bytes = {}                       # computation -> {op_name: bytes}
    comp_re = re.compile(r"^(%[\w.\-]+)\s*\(")
    for line in hlo_text.splitlines():
        if not line.startswith(" "):
            cm = comp_re.match(line)
            comp_name = cm.group(1) if cm else None
            continue
        if comp_name is None:
            continue
        nm = _OPNAME_RE.search(line)
        if not nm:
            continue
        m = _SHAPE_RE.search(line)
        nb = 1
        if m and m.group(1) in _ITEMSIZE:
            for d in m.group(2).split(","):
                if d:
                    nb *= int(d)
            nb *= _ITEMSIZE[m.group(1)]
        comp_bytes.setdefault(comp_name, collections.Counter())[
            nm.group(1)] += nb
    comp_rep = {c: max(names, key=names.get)
                for c, names in comp_bytes.items()}
    calls_re = re.compile(r"calls=(%[\w.\-]+)")

    in_entry = not entry_only
    for line in hlo_text.splitlines():
        if entry_only:
            if line.startswith("ENTRY"):
                in_entry = True
                continue
            if in_entry and line.startswith("}"):
                in_entry = False
            if not in_entry:
                continue
        m = _SHAPE_RE.search(line)
        if not m:
            continue
        dtype, dims, opcode = m.groups()
        if dtype not in _ITEMSIZE or opcode in _ALIAS_OPS:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes = n * _ITEMSIZE[dtype]
        by_op[opcode] += nbytes
        by_op_n[opcode] += 1
        nm = _OPNAME_RE.search(line)
        op_name = nm.group(1) if nm else None
        if op_name is None:
            cm = calls_re.search(line)
            if cm:
                op_name = comp_rep.get(cm.group(1))
        by_module[_module_of(op_name) if op_name else "(no-metadata)"] \
            += nbytes
        ops.append((nbytes, opcode, dtype, dims, line.strip()[:160]))
    ops.sort(reverse=True)
    return by_op, by_op_n, by_module, ops[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("dsgn", "srcnn"), default="dsgn")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--depthconv", default=None,
                    choices=(None, "transpose", "pallas"))
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dump", default=None,
                    help="also write the full HLO text here")
    ap.add_argument("--cpu", action="store_true",
                    help="audit the CPU-backend HLO (smoke/testing; the "
                         "env var is overridden by the image's "
                         "sitecustomize, so force via jax.config)")
    ap.add_argument("--all-computations", action="store_true",
                    help="census every computation, not just ENTRY "
                         "(includes fusion bodies that never materialize)")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import dataclasses
    import os

    import bench  # repo-root bench.py: reuse its exact step construction
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_eval_driving_safety"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.model == "dsgn":
        from eval_driving_safety_tpu.config import DSGNConfig
        from eval_driving_safety_tpu.models.dsgn import DSGN

        cfg = DSGNConfig.tiny() if args.tiny else DSGNConfig.full()
        if args.depthconv:
            cfg = dataclasses.replace(cfg, depthconv_method=args.depthconv)
        model = DSGN(cfg)
        # the EXACT program bench.py times (shared construction)
        params, im_l, im_r, _, step = bench.dsgn_step_setup(cfg, model)
        compiled = step.lower(params, im_l, im_r).compile()
    else:
        from eval_driving_safety_tpu.models.common import cast_matmul_params
        from eval_driving_safety_tpu.models.stereo_rcnn import \
            total_attack_loss

        # bf16 trunk — the attack CLIs' default since round 3
        cfg, model, il, ir, gt = bench._srcnn_setup(args.tiny, bf16=True)
        rng = jax.random.PRNGKey(3)
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), il, ir, gt=gt, rng=rng, mode="attack"))()
        variables = cast_matmul_params(variables)
        uncert = jnp.zeros((6,))

        @jax.jit
        def step(v, g, l, r):
            def loss_fn(l_, r_):
                out = model.apply(v, l_, r_, gt=g, rng=rng, mode="attack")
                return total_attack_loss(out.losses, uncert)
            _, (gl, gr) = jax.value_and_grad(loss_fn, argnums=(0, 1))(l, r)
            return l + jnp.sign(gl), r + jnp.sign(gr)

        compiled = step.lower(variables, gt, il, ir).compile()

    text = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(text)
        print(f"HLO written to {args.dump} ({len(text)} chars)")

    by_op, by_op_n, by_module, top_ops = census(
        text, args.top, entry_only=not args.all_computations)
    total = sum(by_op.values())
    print(f"\n== output-bytes by opcode (total {total / 1e9:.2f} GB) ==")
    for op, b in by_op.most_common(20):
        print(f"  {op:<22} {b / 1e9:8.3f} GB  x{by_op_n[op]}")
    print("\n== output-bytes by module (op_name metadata) ==")
    for mod, b in by_module.most_common(20):
        print(f"  {mod:<44} {b / 1e9:8.3f} GB")
    print(f"\n== top {args.top} ops by output bytes ==")
    for nbytes, opcode, dtype, dims, line in top_ops:
        print(f"  {nbytes / 1e6:9.1f} MB  {opcode:<14} {dtype}[{dims}]")
        print(f"      {line}")


if __name__ == "__main__":
    main()
