"""fvecs/ivecs IO tests: round-trip, reference header semantics, guards."""

import numpy as np
import pytest

from prefhetch_tpu.data.io import (
    read_fvecs,
    read_ivecs,
    vecs_read,
    write_fvecs,
    write_ivecs,
)


def test_fvecs_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(17, 9)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, arr)
    out = read_fvecs(p)
    np.testing.assert_array_equal(out, arr)


def test_ivecs_roundtrip(tmp_path, rng):
    arr = rng.integers(0, 10_000, size=(5, 100)).astype(np.int32)
    p = str(tmp_path / "gt.ivecs")
    write_ivecs(p, arr)
    out = read_ivecs(p)
    np.testing.assert_array_equal(out, arr)


def test_handbuilt_file_layout(tmp_path):
    """Byte-level check of the TEXMEX layout the reference parses
    (include/common/client_server_utils.h:24-56)."""
    import struct

    p = tmp_path / "hand.fvecs"
    # two rows, d=3
    with open(p, "wb") as f:
        f.write(struct.pack("<i3f", 3, 1.0, 2.0, 3.0))
        f.write(struct.pack("<i3f", 3, 4.0, 5.0, 6.0))
    out = read_fvecs(str(p))
    np.testing.assert_array_equal(out, [[1, 2, 3], [4, 5, 6]])


def test_vecs_read_reference_shape(tmp_path, rng):
    arr = rng.normal(size=(4, 8)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, arr)
    d, n, flat = vecs_read(p)
    assert (d, n) == (8, 4)
    np.testing.assert_array_equal(flat.reshape(n, d), arr)


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        read_fvecs("/nonexistent/foo.fvecs")


def test_corrupt_size_raises(tmp_path):
    p = tmp_path / "bad.fvecs"
    p.write_bytes(b"\x03\x00\x00\x00" + b"\x00" * 7)  # truncated row
    with pytest.raises(ValueError):
        read_fvecs(str(p))


def test_bad_dimension_raises(tmp_path):
    p = tmp_path / "bad.fvecs"
    p.write_bytes(b"\xff\xff\xff\xff" + b"\x00" * 4)  # d = -1
    with pytest.raises(ValueError):
        read_fvecs(str(p))
