"""Native C++ library tests: vecio, JSON codec, Shoup NTT vs oracles."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from prefhetch_tpu import native
from prefhetch_tpu.data.io import write_fvecs, write_ivecs

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_read_fvecs(tmp_path, rng):
    arr = rng.normal(size=(50, 17)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, arr)
    out = native.read_vecs_native(p, np.float32)
    np.testing.assert_array_equal(out, arr)


def test_native_read_ivecs(tmp_path, rng):
    arr = rng.integers(0, 100000, size=(20, 100)).astype(np.int32)
    p = str(tmp_path / "x.ivecs")
    write_ivecs(p, arr)
    out = native.read_vecs_native(p, np.int32)
    np.testing.assert_array_equal(out, arr)


def test_native_read_corrupt_header(tmp_path):
    p = tmp_path / "bad.fvecs"
    p.write_bytes(b"\xff\xff\xff\xff" + b"\x00" * 4)
    with pytest.raises(ValueError):
        native.read_vecs_native(str(p), np.float32)


def test_json_encode_f32_roundtrip(rng):
    x = rng.normal(size=1000).astype(np.float32) * 1e6
    s = native.json_encode_f32(x)
    back = np.asarray(json.loads(s), np.float32)
    np.testing.assert_array_equal(back, x)  # %.9g guarantees f32 round-trip


def test_json_encode_i64(rng):
    x = rng.integers(-(2**62), 2**62, size=500).astype(np.int64)
    s = native.json_encode_i64(x)
    assert json.loads(s) == x.tolist()


def test_json_encode_nested_matches_stdlib(rng):
    x = rng.normal(size=(7, 5, 3)).astype(np.float32)
    s = native.json_encode_f32_nested(x)
    got = np.asarray(json.loads(s), np.float32)
    np.testing.assert_array_equal(got, x)


def test_json_decode_array_roundtrip(rng):
    x = rng.normal(size=2000).astype(np.float32) * 1e4
    body = native.json_encode_f32(x)
    back = native.json_decode_array(body)
    np.testing.assert_array_equal(back.astype(np.float32), x)


def test_json_decode_field():
    body = json.dumps(
        {
            "other": [9, 9],
            "coarseDistanceScores": [1.5, -2.25, 3e7],
            "listSizesPerQuery": [3],
        }
    ).encode()
    got = native.json_decode_field(body, "coarseDistanceScores")
    np.testing.assert_array_equal(got, [1.5, -2.25, 3e7])
    sizes = native.json_decode_field(body, "listSizesPerQuery")
    np.testing.assert_array_equal(sizes, [3])
    assert native.json_decode_field(body, "missingKey") is None
    # non-array value → fallback signal, not a crash
    assert native.json_decode_field(b'{"k": 3}', "k") is None


def test_json_decode_empty_array():
    got = native.json_decode_field(b'{"a": []}', "a")
    assert got is not None and got.size == 0


def test_json_decode_malformed_rejected():
    # whitespace is not a separator: "[1 2 3]" must signal malformed (None →
    # caller falls back to stdlib json, which raises), never silently return
    # a truncated array
    assert native.json_decode_array(b"[1 2 3]") is None
    assert native.json_decode_array(b"[1,,2]") is None
    assert native.json_decode_array(b"[,1]") is None
    # whitespace around commas stays fine
    got = native.json_decode_array(b"[ 1 , 2 ,\n 3 ]")
    if got is not None:
        np.testing.assert_array_equal(got, [1, 2, 3])


def test_native_ntt_matches_reference():
    from prefhetch_tpu.crypto.ntt import build_tables, intt, ntt
    from prefhetch_tpu.crypto.params import find_ntt_primes

    n = 1024
    q = find_ntt_primes(n, 30, 1)[0]
    tb = build_tables(q, n)
    rng = np.random.default_rng(0)
    x = rng.integers(0, q, (8, n)).astype(np.int64)

    fwd = native.NativeNTT(q, n, inverse=False)
    inv = native.NativeNTT(q, n, inverse=True)

    got_f = fwd(x)
    ref_f = np.asarray(ntt(jnp.asarray(x), tb))
    np.testing.assert_array_equal(got_f, ref_f)

    got_i = inv(got_f)
    np.testing.assert_array_equal(got_i, x)
    ref_i = np.asarray(intt(jnp.asarray(got_f), tb))
    np.testing.assert_array_equal(got_i, ref_i)
