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


def test_mcraw_roundtrip(tmp_path):
    """MCRAW container: write (F, C, H, W) frames + timestamps, mmap them
    back bit-exact through McrawReader."""
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (5, 2, 32, 40), dtype=np.int64).astype(
        np.uint8
    )
    ts = np.array([0.0, 0.051, 0.1, 0.152, 0.2])
    path = tmp_path / "session.mcraw"
    native_loader.mcraw_write(path, frames, ts)

    reader = native_loader.McrawReader(path)
    assert len(reader) == 5
    assert (reader.n_cams, reader.height, reader.width) == (2, 32, 40)
    k = 0
    while True:
        nxt = reader.get_next()
        if nxt is None:
            break
        imgs, t = nxt
        assert abs(t - ts[k]) < 1e-9
        np.testing.assert_array_equal(
            (imgs * 255.0 + 0.5).astype(np.uint8), frames[k]
        )
        k += 1
    assert k == 5
    reader.close()


def test_mcraw_converter_script(tmp_path):
    """Folder dataset -> converter -> MCRAW replay matches the folder read."""
    import sys

    sys.path.insert(0, "scripts")
    import convert_to_mcraw

    import cv2

    rng = np.random.RandomState(5)
    imgs = []
    for c in range(2):
        (tmp_path / f"cam{c}").mkdir()
    for i in range(3):
        per_cam = []
        for c in range(2):
            img = (rng.rand(48, 64) * 255).astype(np.uint8)
            cv2.imwrite(str(tmp_path / f"cam{c}" / f"{i * 0.05:.6f}.png"),
                        img)
            per_cam.append(img)
        imgs.append(per_cam)
    out = tmp_path / "conv.mcraw"
    rc = convert_to_mcraw.main([str(tmp_path), str(out)])
    assert rc == 0
    reader = native_loader.McrawReader(out)
    assert len(reader) == 3
    frame0, t0 = reader.get_next()
    assert abs(t0 - 0.0) < 1e-6
    ref = imgs[0][0].astype(np.float32) / 255.0
    np.testing.assert_allclose(frame0[0], ref, atol=1.5 / 255.0)
    reader.close()
