"""Tokenizer loading: HuggingFace umT5 tokenizer when files are available
(the reference loads google/umt5-xxl, wan_civitai.yaml:16), with a
deterministic hash tokenizer fallback so tests/benchmarks run in a zero-
egress environment."""

from __future__ import annotations

from typing import Optional

import numpy as np


class HashTokenizer:
    """Deterministic stand-in tokenizer (whitespace words -> hashed ids).
    NOT linguistically meaningful — only for tests and offline benchmarks."""

    def __init__(self, vocab_size: int = 256384, eos_id: int = 1, pad_id: int = 0):
        self.vocab_size = vocab_size
        self.eos_id = eos_id
        self.pad_id = pad_id

    def __call__(self, texts, max_length: int = 512, **_):
        if isinstance(texts, str):
            texts = [texts]
        ids = np.full((len(texts), max_length), self.pad_id, np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, t in enumerate(texts):
            toks = [2 + (hash(w) % (self.vocab_size - 2)) for w in t.split()]
            toks = toks[: max_length - 1] + [self.eos_id]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def load_tokenizer(path_or_name: Optional[str] = None, vocab_size: int = 256384):
    """Try HF AutoTokenizer (local files), else the hash fallback."""
    if path_or_name is not None:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(path_or_name)

            def call(texts, max_length=512):
                out = tok(texts if isinstance(texts, list) else [texts],
                          padding="max_length", max_length=max_length,
                          truncation=True, add_special_tokens=True,
                          return_tensors="np")
                return {"input_ids": out["input_ids"].astype(np.int32),
                        "attention_mask": out["attention_mask"].astype(np.int32)}

            return call
        except Exception:
            pass
    return HashTokenizer(vocab_size)
