"""Smoke tests for the offline CLI scripts (vocabulary training +
trajectory evaluation) — the reference's offline tooling counterparts
(pre-trained DBoW2 vocabularies; evaluation.md evo workflow)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))


def _write_images(root, imgs):
    import numpy as np

    try:
        import cv2

        for c in range(imgs.shape[1]):
            d = root / f"cam{c}"
            d.mkdir(parents=True, exist_ok=True)
            for k in range(imgs.shape[0]):
                ts = 1_000_000_000_000_000_000 + k * 50_000_000
                cv2.imwrite(str(d / f"{ts}.png"),
                            (imgs[k, c] * 255).astype(np.uint8))
        return True
    except ImportError:
        return False


def test_train_vocabulary_cli_end_to_end(tmp_path):
    from mcslam_tpu.data import synthetic

    rig = synthetic.make_synthetic_rig(synthetic.SyntheticRigSpec(
        num_cams=2, baseline=0.2, image_size=(160, 120), focal=130.0))
    poses = synthetic.smooth_trajectory(3, radius=5.0, step_angle=0.03)
    lms = synthetic.make_landmarks(300, seed=1, depth_range=(4.0, 10.0))
    imgs = synthetic.render_blob_images(rig, poses, lms, seed=2,
                                        textured=True)
    if not _write_images(tmp_path, imgs):
        import pytest

        pytest.skip("no image writer available")
    out = tmp_path / "vocab.npz"
    import train_vocabulary

    rc = train_vocabulary.main([
        str(tmp_path), str(out), "--k", "4", "--depth", "2",
        "--max_frames", "3", "--num_points", "128", "--num_levels", "2",
    ])
    assert rc in (0, None)
    assert out.exists()
    from mcslam_tpu.loop.vocab import Vocabulary

    v = Vocabulary.load(out)
    import jax.numpy as jnp

    descs = synthetic.make_descriptors(50, seed=3)
    bow = np.asarray(v.transform(jnp.asarray(descs), jnp.ones(50, bool)))
    assert abs(np.linalg.norm(bow) - 1.0) < 1e-4


def test_evaluate_trajectory_cli(tmp_path, capsys):
    from mcslam_tpu.utils import tum

    rng = np.random.RandomState(0)
    N = 10
    poses = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    poses[:, 0, 3] = np.arange(N) * 0.1
    ts = np.arange(N) / 10.0
    est = poses.copy()
    est[:, 1, 3] += rng.randn(N) * 0.01
    tum.write_tum(tmp_path / "gt.txt", ts, poses)
    tum.write_tum(tmp_path / "est.txt", ts, est)
    import evaluate_trajectory

    rc = evaluate_trajectory.main([
        str(tmp_path / "est.txt"), str(tmp_path / "gt.txt"),
    ])
    assert rc in (0, None)
    outtext = capsys.readouterr().out
    assert "ATE" in outtext or "ate" in outtext
