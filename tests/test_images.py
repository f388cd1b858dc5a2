"""Image store + prefetch pipeline tests (data/images.py)."""

import numpy as np
import pytest

from iisan_tpu.data.images import (DirImageStore, LMDBImage,
                                   ParallelImageLoader, SyntheticImageStore,
                                   _to_model_input, normalize_images)


def test_to_model_input_range_and_shape():
    img = np.full((50, 40, 3), 255, np.uint8)
    out = _to_model_input(img, 8)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out, 1.0)  # 255 -> +1 under the +-0.5 norm
    out0 = _to_model_input(np.zeros((10, 10, 3), np.uint8), 8)
    np.testing.assert_allclose(out0, -1.0)


def test_on_device_normalization_matches_host_path():
    """uint8 store output + on-device normalize == the reference float
    pipeline (dataset.py:54-59)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    want = u8.astype(np.float32) / 255.0 * 2.0 - 1.0
    got = np.asarray(normalize_images(jnp.asarray(u8), jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_lmdb_image_record_roundtrip():
    """Record layout parity with Dataset/build_lmdb.py:13-23."""
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    rec = LMDBImage(img, "x")
    np.testing.assert_array_equal(rec.get_image(), img)


def test_dir_store(tmp_path):
    from PIL import Image

    arr = np.random.default_rng(0).integers(0, 255, (12, 12, 3)).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / "item1.jpg")
    store = DirImageStore(str(tmp_path), resize=8)
    out = store.get("item1")
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8


def test_parallel_loader_order_and_shapes():
    store = SyntheticImageStore(resize=8)
    loader = ParallelImageLoader(store, num_threads=4, prefetch=2)
    batches = [[f"a{i}", f"b{i}"] for i in range(10)]
    out = list(loader.iter_batches(batches))
    assert len(out) == 10
    assert all(b.shape == (2, 8, 8, 3) for b in out)
    # determinism: same names -> same pixels, order preserved
    out2 = list(loader.iter_batches(batches))
    np.testing.assert_array_equal(out[3], out2[3])
    assert not np.array_equal(out[3], out[4])


def test_parallel_loader_pad_sentinel_skips_store(tmp_path):
    """Pad id 0 (None name) must never hit the store (advisor r1 high):
    DirImageStore would raise FileNotFoundError for the '<pad>' name."""
    from PIL import Image

    arr = np.random.default_rng(1).integers(0, 255, (12, 12, 3)).astype(np.uint8)
    Image.fromarray(arr).save(tmp_path / "item1.jpg")
    store = DirImageStore(str(tmp_path), resize=8)
    loader = ParallelImageLoader(store, num_threads=2)
    out = list(loader.iter_batches([[None, "item1", None]]))
    assert out[0].shape == (3, 8, 8, 3)
    np.testing.assert_array_equal(out[0][0], 0)  # zero pad image
    np.testing.assert_array_equal(out[0][2], 0)
    assert out[0][1].any()


def test_uncached_batch_names_pad_is_none():
    """UncachedTrainer maps padded positions to the None sentinel."""
    from iisan_tpu.train.uncached import UncachedTrainer

    class C:
        item_names = ["<pad>", "a", "b"]

    names = UncachedTrainer._batch_names(
        type("T", (), {"corpus": C})(), np.array([0, 2, 0, 1]))
    assert names == [None, "b", None, "a"]


class TestNativeFastimage:
    """Native C++ JPEG decode path (native/fastimage.cc via ctypes)."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from iisan_tpu.data import fastimage

        if not fastimage.available():
            pytest.skip("native fastimage not buildable here")

    def _blob(self, arr, quality=95):
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
        return buf.getvalue()

    def test_decode_matches_pil_on_smooth_image(self):
        import io

        from PIL import Image

        from iisan_tpu.data import fastimage

        x = np.linspace(0, 255, 300).astype(np.uint8)
        img = np.stack([np.tile(x, (200, 1))] * 3, axis=-1)
        blob = self._blob(img)
        out = fastimage.decode_resize(blob, 64)
        pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB")
                         .resize((64, 64), Image.BILINEAR))
        assert out.shape == (64, 64, 3) and out.dtype == np.uint8
        assert np.abs(out.astype(int) - pil.astype(int)).mean() < 2.0

    def test_batch_pad_and_bad_blobs_zero_filled(self):
        from iisan_tpu.data import fastimage

        rng = np.random.default_rng(0)
        blob = self._blob(rng.integers(0, 255, (40, 30, 3)).astype(np.uint8))
        out = fastimage.decode_resize_batch([blob, None, b"junk", blob], 16)
        assert out.shape == (4, 16, 16, 3)
        assert out[1].max() == 0 and out[2].max() == 0
        np.testing.assert_array_equal(out[0], out[3])
        assert out[0].any()

    def test_dir_store_uses_native_and_matches_pil_fallback(self, tmp_path):
        # smooth image: on noise the two resamplers legitimately diverge
        # (PIL downscale is antialiased, ours is DCT-downscale + bilinear)
        g = np.linspace(0, 255, 80).astype(np.uint8)
        arr = np.stack([np.tile(g, (100, 1))] * 3, axis=-1)
        with open(tmp_path / "it.jpg", "wb") as f:
            f.write(self._blob(arr))
        fast = DirImageStore(str(tmp_path), resize=32, use_native=True)
        slow = DirImageStore(str(tmp_path), resize=32, use_native=False)
        assert fast._native
        a, b = fast.get("it"), slow.get("it")
        assert a.shape == b.shape == (32, 32, 3)
        # decoders agree closely (different bilinear taps round differently)
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 6.0
