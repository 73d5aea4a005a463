#!/usr/bin/env python
"""Generate the committed tiny random-weight token-classification checkpoint
(tests/fixtures/tiny_ner_model.npz) used by the ``numpy`` extraction backend:
a 1024-bucket hashed char-trigram embedding (dim 16) + linear head over the
9-label BIO vocabulary. Random weights, fixed seed — the point is executing
the full model-backend path (load → batch inference → span emission → span→
token alignment), not label quality. Regenerate with:

    python scripts/make_tiny_ner_model.py
"""

from __future__ import annotations

import os

import numpy as np

LABELS = ["O", "B-PRODUCT", "I-PRODUCT", "B-PRICE", "I-PRICE",
          "B-LOC", "I-LOC", "B-CONTACT_INFO", "I-CONTACT_INFO"]
V, D, SEED = 1024, 16, 7

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "tiny_ner_model.npz")


def main() -> None:
    rng = np.random.RandomState(SEED)
    emb = rng.normal(0.0, 1.0, size=(V, D)).astype("float32")
    w = rng.normal(0.0, 0.5, size=(D, len(LABELS))).astype("float32")
    # bias towards O so spans are sparse-ish (like a real NER head)
    b = np.full(len(LABELS), -0.5, dtype="float32")
    b[0] = 1.0
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, emb=emb, w=w, b=b, labels=np.array(LABELS))
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
