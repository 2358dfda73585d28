"""Native C++ shard reader: parity with the numpy path (skipped if unbuilt)."""

import os
import subprocess

import numpy as np
import pytest

from gpt2_vision_language_tpu.data.fineweb import TokenShardLoader, write_token_shard

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_built() -> bool:
    lib = os.path.join(ROOT, "csrc", "libshardreader.so")
    if os.path.exists(lib):
        return True
    try:
        subprocess.run(
            ["make", "-C", os.path.join(ROOT, "csrc")],
            check=True,
            capture_output=True,
        )
        return os.path.exists(lib)
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _ensure_built(), reason="native shard reader not built"
)


def test_reader_roundtrip(tmp_path):
    from gpt2_vision_language_tpu.data.native import NativeShardReader

    for dtype in (np.uint16, np.int32):
        p = str(tmp_path / f"s_{dtype.__name__}.npy")
        np.save(p, np.arange(4096, dtype=dtype))
        r = NativeShardReader(p)
        assert len(r) == 4096
        np.testing.assert_array_equal(r.read(1000, 96), np.arange(1000, 1096))
        r.prefetch(2000, 500)  # must not crash or corrupt
        np.testing.assert_array_equal(r.read(2000, 8), np.arange(2000, 2008))
        r.close()


def test_reader_bounds(tmp_path):
    from gpt2_vision_language_tpu.data.native import NativeShardReader

    p = str(tmp_path / "s.npy")
    np.save(p, np.arange(100, dtype=np.uint16))
    r = NativeShardReader(p)
    with pytest.raises(IOError):
        r.read(90, 20)  # out of range
    r.close()


def test_loader_native_matches_numpy(tmp_path):
    d = str(tmp_path)
    write_token_shard(os.path.join(d, "a_train_0"), np.arange(3000, dtype=np.uint16))
    write_token_shard(
        os.path.join(d, "a_train_1"), np.arange(3000, 6000, dtype=np.uint16)
    )
    ln = TokenShardLoader(2, 16, split="train", data_dir=d, use_native=True)
    lp = TokenShardLoader(2, 16, split="train", data_dir=d, use_native=False)
    for _ in range(200):  # crosses shard boundaries
        xn, yn = ln.next_batch()
        xp, yp = lp.next_batch()
        np.testing.assert_array_equal(xn, xp)
        np.testing.assert_array_equal(yn, yp)


def test_reader_dtype_semantics(tmp_path):
    """'<i2' negatives sign-extend; int64 values outside int32 range are a
    clean error, not a silent wrap."""
    from gpt2_vision_language_tpu.data.native import NativeShardReader

    p16 = str(tmp_path / "i2.npy")
    np.save(p16, np.asarray([-5, 0, 7, -32768], dtype=np.int16))
    r = NativeShardReader(p16)
    np.testing.assert_array_equal(r.read(0, 4), [-5, 0, 7, -32768])
    r.close()

    p64 = str(tmp_path / "i8.npy")
    np.save(p64, np.asarray([1, 2**40], dtype=np.int64))
    r = NativeShardReader(p64)
    np.testing.assert_array_equal(r.read(0, 1), [1])
    with pytest.raises(IOError):
        r.read(0, 2)  # 2**40 does not fit int32
    r.close()
