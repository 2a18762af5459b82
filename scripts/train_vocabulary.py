#!/usr/bin/env python
"""Train a BoW vocabulary from a dataset's ORB descriptors.

Parity (WHAT): the reference ships pre-trained DBoW2/fbow vocabulary files
(config keys Vocabulary / FBOWVocabulary); this tool creates the equivalent
for this framework's descriptors (which use their own BRIEF pattern, so
OpenCV/DBoW2 vocabularies do not transfer).

Usage:
  python scripts/train_vocabulary.py <image_root> out_vocab.npz \
      [--k 8] [--depth 4] [--max_frames 200] [--num_points 512]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("image_root")
    ap.add_argument("out")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--max_frames", type=int, default=200)
    ap.add_argument("--num_points", type=int, default=512)
    ap.add_argument("--num_levels", type=int, default=4)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from mcslam_tpu.data.readers import ImageFolderReader
    from mcslam_tpu.loop.vocab import Vocabulary
    from mcslam_tpu.ops import orb

    reader = ImageFolderReader(args.image_root)
    descs = []
    n = 0
    while n < args.max_frames:
        nxt = reader.get_next()
        if nxt is None:
            break
        imgs, _ = nxt
        kps = orb.extract_orb_rig(
            jnp.asarray(imgs), num_points=args.num_points,
            num_levels=args.num_levels,
        )
        d = np.asarray(kps.desc)[np.asarray(kps.valid)]
        descs.append(d)
        n += 1
        if n % 20 == 0:
            print(f"{n} frames, {sum(len(x) for x in descs)} descriptors",
                  file=sys.stderr)
    all_desc = np.concatenate(descs)
    print(f"training k={args.k} depth={args.depth} on {len(all_desc)} "
          f"descriptors", file=sys.stderr)
    vocab = Vocabulary.train(all_desc, k=args.k, depth=args.depth)
    vocab.save(args.out)
    print(f"saved {vocab.num_words}-word vocabulary -> {args.out}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
