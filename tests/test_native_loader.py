"""Native C++ loader: decode correctness + in-order prefetch ring."""

import numpy as np
import pytest

from mcslam_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


def _write_images(tmp_path, n_frames=6, n_cams=2, w=64, h=48, seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    rows = []
    imgs = []
    for i in range(n_frames):
        group = []
        frame_imgs = []
        for c in range(n_cams):
            img = (rng.rand(h, w) * 255).astype(np.uint8)
            ext = [".png", ".jpg", ".pgm"][i % 3]
            p = tmp_path / f"f{i}_c{c}{ext}"
            cv2.imwrite(str(p), img)
            group.append(p)
            frame_imgs.append(img)
        rows.append((i * 0.05, group))
        imgs.append(frame_imgs)
    return rows, imgs


def test_native_decode_matches_opencv(tmp_path):
    rows, imgs = _write_images(tmp_path)
    reader = native_loader.NativePrefetchReader(rows, depth=3, threads=2)
    assert len(reader) == 6
    k = 0
    while True:
        nxt = reader.get_next()
        if nxt is None:
            break
        frame, ts = nxt
        assert frame.shape == (2, 48, 64)
        assert abs(ts - k * 0.05) < 1e-9
        for c in range(2):
            ref = imgs[k][c].astype(np.float32) / 255.0
            if k % 3 == 1:  # jpeg is lossy
                assert np.abs(frame[c] - ref).mean() < 0.03
            else:
                np.testing.assert_allclose(frame[c], ref, atol=1.5 / 255.0)
        k += 1
    assert k == 6
    reader.close()


def test_probe_image(tmp_path):
    rows, _ = _write_images(tmp_path, n_frames=1, n_cams=1)
    w, h = native_loader.probe_image(rows[0][1][0])
    assert (w, h) == (64, 48)
