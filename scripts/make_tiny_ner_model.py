#!/usr/bin/env python
"""Generate the committed tiny random-weight token-classification checkpoint
(tests/fixtures/tiny_ner_model.npz) used by the ``numpy`` extraction backend:
a 1024-bucket hashed char-trigram embedding (dim 16) + linear head over the
9-label BIO vocabulary. Random weights, fixed seed — the point is executing
the full model-backend path (load → batch inference → span emission → span→
token alignment), not label quality. Regenerate with:

    python scripts/make_tiny_ner_model.py

``make_tiny_hf_model(out_dir)`` additionally emits a HuggingFace-format
token-classification checkpoint (tiny random-weight BERT + WordPiece
tokenizer, same BIO label vocabulary) for exercising the ``hf`` backend
where ``transformers``+``torch`` are installed (reference
``model_evaluator.py:81-142`` loads exactly this artifact shape); also
reachable as ``python scripts/make_tiny_ner_model.py --hf <out_dir>``.
"""

from __future__ import annotations

import os

import numpy as np

LABELS = ["O", "B-PRODUCT", "I-PRODUCT", "B-PRICE", "I-PRICE",
          "B-LOC", "I-LOC", "B-CONTACT_INFO", "I-CONTACT_INFO"]
V, D, SEED = 1024, 16, 7

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "tiny_ner_model.npz")


def make_tiny_hf_model(out_dir: str) -> str:
    """Emit a tiny random-weight HF token-classification checkpoint
    (config.json + weights + WordPiece tokenizer) loadable by
    ``transformers.pipeline('ner', model=out_dir, tokenizer=out_dir)`` —
    the exact artifact shape the ``hf`` extraction backend consumes.
    Requires ``transformers`` + ``torch`` (raises ImportError otherwise —
    callers gate on availability)."""
    import torch
    from transformers import BertConfig, BertForTokenClassification, BertTokenizerFast

    # minimal WordPiece vocab: specials + ascii letters/digits + continuations
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [chr(c) for c in range(ord("a"), ord("z") + 1)]
             + [str(d) for d in range(10)]
             + [f"##{chr(c)}" for c in range(ord("a"), ord("z") + 1)]
             + [f"##{d}" for d in range(10)])
    os.makedirs(out_dir, exist_ok=True)
    vocab_path = os.path.join(out_dir, "vocab.txt")
    with open(vocab_path, "w", encoding="utf-8") as f:
        f.write("\n".join(vocab) + "\n")

    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=512,
        id2label={i: lab for i, lab in enumerate(LABELS)},
        label2id={lab: i for i, lab in enumerate(LABELS)},
    )
    torch.manual_seed(SEED)
    model = BertForTokenClassification(cfg)
    model.save_pretrained(out_dir)
    BertTokenizerFast(vocab_file=vocab_path,
                      model_max_length=512).save_pretrained(out_dir)
    return out_dir


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
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "--hf":
        if len(sys.argv) < 3:
            sys.exit("usage: make_tiny_ner_model.py --hf <out_dir>")
        print(f"wrote HF checkpoint to {make_tiny_hf_model(sys.argv[2])}")
    elif len(sys.argv) > 1:
        sys.exit(f"unknown argument {sys.argv[1]!r}; "
                 "usage: make_tiny_ner_model.py [--hf <out_dir>]")
    else:
        main()
