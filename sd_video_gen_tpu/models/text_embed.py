"""Class-name text embeddings as an on-device lookup table.

The reference runs a frozen SentenceTransformer (MiniLM-L6-v2) on *host CPU
inside every forward pass* (models/transformer_text.py:82-83) — a per-step
device<->host sync. The conditioning set is a fixed vocabulary (<=101 UCF
class names), so the TPU-native equivalent is exact: precompute the embedding
of each class name once, store the (num_classes, 384) table on device, and
``take`` rows by label id inside the jitted step.

Tables can be:
  - loaded from an ``.npy`` exported by ``tools/export_text_embeddings.py``
    (bit-identical MiniLM embeddings when sentence-transformers is available), or
  - derived deterministically from the class-name strings (hash-seeded unit
    gaussians) so the text pipeline runs hermetically without MiniLM weights.
"""

from __future__ import annotations

import hashlib

import numpy as np
import jax.numpy as jnp


def _name_embedding(name: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(name.encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def split_class_name(name: str) -> str:
    """'WallPushups' -> 'Wall Pushups' (trainers/trainer_text.py splitClassNames
    semantics: CamelCase directory names become prompts)."""
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0 and not name[i - 1].isupper():
            out.append(" ")
        out.append(ch)
    return "".join(out)


class ClassNameEmbedder:
    def __init__(self, num_classes: int, dim: int = 384,
                 table: np.ndarray | None = None,
                 names: list[str] | None = None):
        if table is not None:
            assert table.shape[1] == dim
            self.table = jnp.asarray(table, jnp.float32)
        elif names is not None:
            self.table = jnp.asarray(
                np.stack([_name_embedding(split_class_name(n), dim)
                          for n in names]), jnp.float32)
        else:
            self.table = jnp.asarray(
                np.stack([_name_embedding(f"class_{i}", dim)
                          for i in range(num_classes)]), jnp.float32)
        self.dim = dim

    @classmethod
    def from_npy(cls, path: str) -> "ClassNameEmbedder":
        t = np.load(path)
        return cls(t.shape[0], t.shape[1], table=t)

    def __call__(self, labels: jnp.ndarray) -> jnp.ndarray:
        """(B,) int32 class ids -> (B, dim) f32 embeddings (device-side take).

        Concrete (non-traced) ids are bounds-checked: jnp.take silently
        CLAMPS out-of-range ids to the last row, so a table smaller than
        the label space would condition every overflow class on the final
        class's embedding with no error. Inside jit the clamp semantics
        remain (XLA gather cannot raise)."""
        import jax

        if not isinstance(labels, jax.core.Tracer):
            mx = int(jnp.max(labels)) if np.ndim(labels) else int(labels)
            if mx >= self.table.shape[0] or int(jnp.min(labels)) < 0:
                raise IndexError(
                    f"class id out of range for {self.table.shape[0]}-row "
                    "text-embedding table")
        return jnp.take(self.table, labels, axis=0)
