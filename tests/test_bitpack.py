"""Bit-packing round trip vs numpy's packbits (ops/bitpack.py)."""
import numpy as np

from segdino3d_tpu.ops.bitpack import pack_bits, unpack_bits_np


def test_roundtrip_exact_multiple():
    rng = np.random.RandomState(0)
    x = rng.rand(7, 128) > 0.5
    packed = np.asarray(pack_bits(x))
    assert packed.shape == (7, 16) and packed.dtype == np.uint8
    np.testing.assert_array_equal(
        packed, np.packbits(x, axis=-1, bitorder="little"))
    np.testing.assert_array_equal(unpack_bits_np(packed, 128), x)


def test_roundtrip_ragged_tail():
    rng = np.random.RandomState(1)
    x = rng.rand(3, 61) > 0.3
    packed = np.asarray(pack_bits(x))
    assert packed.shape == (3, 8)
    np.testing.assert_array_equal(unpack_bits_np(packed, 61), x)


def test_single_axis_and_empty_rows():
    x = np.zeros((2, 24), bool)
    x[1, [0, 8, 23]] = True
    np.testing.assert_array_equal(
        unpack_bits_np(np.asarray(pack_bits(x)), 24), x)
