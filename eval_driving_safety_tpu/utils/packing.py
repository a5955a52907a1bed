"""Single-buffer device->host output packing.

On a tunneled/remote accelerator every fetched array is its own
device->host RPC, so pulling a detector-output pytree (a dozen-odd small
leaves) costs a dozen round-trip latencies even though the payload is
tiny — the stage-3 e2e measurement had per-leaf fetches (~0.9 s/frame)
dominating the predict/export pipeline. These helpers concatenate all
leaves into ONE uint32 buffer inside the jitted program (pure data
movement: bitcasts + a concatenate that XLA lowers to copies) so the
host pays ONE transfer, then reinterpret the bytes back into the
original pytree on the host.

Encodings are lossless:
  * 4-byte leaves (f32/i32/u32) are bitcast — bit-identical bytes;
  * 8-byte leaves are bitcast to a (..., 2) u32 pair;
  * 2-byte floats (bf16/f16) widen exactly through f32;
  * bool/u8 widen through u32; i8/i16 through i32 (then bitcast).

Capability parity note: the reference fetches each torch tensor
individually over PCIe where per-tensor latency is negligible
(/root/reference/attack/DSGN/predict_and_save_pgd.py:364-395); on a
tunneled TPU the per-RPC latency is the bottleneck this removes.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class _LeafSpec(NamedTuple):
    shape: Tuple[int, ...]
    dtype: Any            # original numpy dtype
    kind: str             # 'b4' | 'b8' | 'f32' | 'u32' | 'i32'
    words: int            # u32 words occupied in the buffer


class PackSpec(NamedTuple):
    treedef: Any
    leaves: Tuple[_LeafSpec, ...]


def _encode_leaf(x):
    """Device-side encode to a 1-D u32 segment + its host decode spec."""
    dt = np.dtype(x.dtype)
    n = int(np.prod(x.shape)) if x.ndim else 1
    if dt.itemsize == 4:
        seg = jax.lax.bitcast_convert_type(x, jnp.uint32).ravel()
        spec = _LeafSpec(x.shape, dt, "b4", n)
    elif dt.itemsize == 8:
        seg = jax.lax.bitcast_convert_type(x, jnp.uint32).ravel()
        spec = _LeafSpec(x.shape, dt, "b8", 2 * n)
    elif dt.kind == "f" or dt.kind == "V":      # f16 / bfloat16
        seg = jax.lax.bitcast_convert_type(
            x.astype(jnp.float32), jnp.uint32).ravel()
        spec = _LeafSpec(x.shape, dt, "f32", n)
    elif dt.kind in ("b", "u"):                 # bool / u8 / u16
        seg = x.astype(jnp.uint32).ravel()
        spec = _LeafSpec(x.shape, dt, "u32", n)
    elif dt.kind == "i":                        # i8 / i16
        seg = jax.lax.bitcast_convert_type(
            x.astype(jnp.int32), jnp.uint32).ravel()
        spec = _LeafSpec(x.shape, dt, "i32", n)
    else:
        raise TypeError(f"unsupported leaf dtype {dt}")
    return seg, spec


def pack_tree(tree):
    """In-jit: pytree -> (1-D u32 buffer, PackSpec). The spec is static
    python data (built from tracer shapes at trace time) — thread it to
    the host via `packed_jit` below, not through the jit boundary."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return jnp.zeros((0,), jnp.uint32), PackSpec(treedef, ())
    segs, specs = zip(*(_encode_leaf(jnp.asarray(l)) for l in leaves))
    return jnp.concatenate(segs), PackSpec(treedef, tuple(specs))


def unpack_tree(buf, spec: PackSpec):
    """Host: 1-D u32 buffer (np or jax array; np.asarray performs the one
    fetch if still on device) -> pytree of numpy arrays, bit-identical to
    the packed tree's leaves."""
    buf = np.ascontiguousarray(np.asarray(buf))
    out, off = [], 0
    for ls in spec.leaves:
        seg = buf[off:off + ls.words]
        off += ls.words
        if ls.kind in ("b4", "b8"):
            a = np.ascontiguousarray(seg).view(ls.dtype).reshape(ls.shape)
        elif ls.kind == "f32":
            a = seg.view(np.float32).astype(ls.dtype).reshape(ls.shape)
        elif ls.kind == "u32":
            a = seg.astype(ls.dtype).reshape(ls.shape)
        else:                                   # 'i32'
            a = seg.view(np.int32).astype(ls.dtype).reshape(ls.shape)
        out.append(a)
    return jax.tree_util.tree_unflatten(spec.treedef, out)


def packed_jit(fn, **jit_kwargs):
    """jit(fn) whose pytree output crosses the device->host link as ONE
    u32 buffer. Returns (packed_fn, unpack): call `buf = packed_fn(...)`
    (dispatch, non-blocking as usual), later `tree = unpack(buf)` on the
    host (numpy leaves). The spec slot is captured at trace time and
    overwritten on retrace, so per-call output SHAPES must be stable —
    true for every fixed-batch pipeline here (static model shapes)."""
    box = {}

    def wrapped(*a, **k):
        buf, spec = pack_tree(fn(*a, **k))
        box["spec"] = spec
        return buf

    jitted = jax.jit(wrapped, **jit_kwargs)

    def unpack(buf):
        return unpack_tree(buf, box["spec"])

    return jitted, unpack
