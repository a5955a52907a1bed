"""Single-buffer fetch packing (utils/packing.py): bit-exact roundtrip
of detector-output-shaped pytrees through ONE u32 device buffer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eval_driving_safety_tpu.utils.packing import (pack_tree, packed_jit,
                                                   unpack_tree)


def _roundtrip(tree):
    spec_box = {}

    @jax.jit
    def f():
        buf, spec = pack_tree(tree)
        spec_box["s"] = spec
        return buf

    return unpack_tree(f(), spec_box["s"])


def test_roundtrip_all_dtypes_bit_exact():
    rng = np.random.RandomState(0)
    tree = {
        "f32": rng.randn(3, 5).astype(np.float32),
        "i32": rng.randint(-2**31, 2**31 - 1, (7,), np.int64)
               .astype(np.int32),
        "u32": rng.randint(0, 2**32 - 1, (2, 2), np.uint64)
               .astype(np.uint32),
        "bf16": jnp.asarray(rng.randn(4, 3), jnp.bfloat16),
        "bool": rng.rand(9) > 0.5,
        "u8": rng.randint(0, 256, (6, 2), np.uint8),
        "i8": rng.randint(-128, 128, (5,), np.int64).astype(np.int8),
        "scalar": np.float32(3.25),
        "nested": (np.arange(4, dtype=np.int32),
                   [np.float32([1.5, -0.25])]),
    }
    out = _roundtrip(tree)
    flat_in = jax.tree_util.tree_leaves(tree)
    flat_out = jax.tree_util.tree_leaves(out)
    assert len(flat_in) == len(flat_out)
    for a, b in zip(flat_in, flat_out):
        a = np.asarray(a)
        assert a.shape == b.shape and a.dtype == b.dtype, (a.dtype, b.dtype)
        assert np.array_equal(np.atleast_1d(a).view(np.uint8),
                              np.atleast_1d(b).view(np.uint8))


def test_roundtrip_preserves_nan_payloads_and_extremes():
    # transfers must be pure data movement: exotic f32 bit patterns
    # (quiet/signalling NaN payloads, -0.0, denormals, inf) survive
    bits = np.array([0x7fc00001, 0x7f800001, 0x80000000, 0x00000001,
                     0x7f800000, 0xff800000], np.uint32)
    tree = {"x": bits.view(np.float32)}
    out = _roundtrip(tree)
    assert np.array_equal(out["x"].view(np.uint32), bits)


def test_packed_jit_namedtuple_structure():
    from typing import NamedTuple

    class Out(NamedTuple):
        a: jnp.ndarray
        b: jnp.ndarray

    def fn(x):
        return Out(a=x * 2.0, b=(x > 0).astype(jnp.int32))

    f, unpack = packed_jit(fn)
    x = jnp.asarray(np.float32([-1.0, 2.0, 0.5]))
    tree = unpack(f(x))
    assert isinstance(tree, Out)
    np.testing.assert_array_equal(tree.a, [-2.0, 4.0, 1.0])
    np.testing.assert_array_equal(tree.b, [0, 1, 1])
    assert tree.a.dtype == np.float32 and tree.b.dtype == np.int32


def test_empty_tree():
    f, unpack = packed_jit(lambda: {})
    assert unpack(f()) == {}


def test_single_device_buffer():
    """The point of the exercise: exactly one device array crosses."""
    f, unpack = packed_jit(lambda x: {"a": x, "b": x + 1, "c": x * 2})
    buf = f(jnp.ones((4,), jnp.float32))
    assert buf.dtype == jnp.uint32 and buf.ndim == 1
    tree = unpack(buf)
    assert set(tree) == {"a", "b", "c"}
