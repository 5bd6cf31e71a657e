"""Export MiniLM class-name embeddings to an .npy lookup table.

The reference runs SentenceTransformer('all-MiniLM-L6-v2') on host inside
every forward (models/transformer_text.py:82-83). The conditioning vocabulary
is the fixed set of UCF class names, so this one-time export produces the
(num_classes, 384) table that models/text_embed.ClassNameEmbedder loads —
bit-identical text conditioning with zero runtime host syncs.

Usage (needs sentence-transformers, not in this image — run where available):
  python tools/export_text_embeddings.py --data_dir data/UCF-101/UCF-101 \
      --out class_embeddings.npy
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True,
                   help="UCF root whose subdirs are class names")
    p.add_argument("--out", default="class_embeddings.npy")
    args = p.parse_args(argv)

    from sd_video_gen_tpu.data.ucf101 import find_classes
    from sd_video_gen_tpu.models.text_embed import split_class_name
    names = [split_class_name(c) for c in find_classes(args.data_dir)]

    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:
        raise SystemExit(f"sentence-transformers unavailable: {e}. "
                         "Run this tool in an environment that has it; "
                         "ClassNameEmbedder falls back to deterministic "
                         "hash embeddings meanwhile.")
    model = SentenceTransformer("sentence-transformers/all-MiniLM-L6-v2")
    table = np.asarray(model.encode(names), np.float32)
    np.save(args.out, table)
    print(f"saved {table.shape} embeddings for {len(names)} classes to {args.out}")


if __name__ == "__main__":
    main()
