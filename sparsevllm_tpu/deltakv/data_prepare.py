"""Compressor-training data pipeline: local corpora -> packed token blocks.

Re-expresses the reference's src/deltakv/data_prepare/ (tokenize_and_pack +
training collators): real calibration text is tokenized once, token streams
are concatenated with an EOS separator, and the stream is cut into
fixed-length blocks so every training prompt is a full ``seq_len`` window
(no padding, no attention masks — packed blocks keep the MXU busy and make
the residual statistics match deployment-time long contexts).

Zero-egress environment: corpora load from LOCAL files only (.txt, .jsonl
with a "text"/"prompt" field); a missing path is a loud error, never a
silent fallback to synthetic data. Engines without a tokenizer
(tiny-random) use the repo's deterministic byte-level fallback so the
pipeline itself is testable offline.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..utils.log import logger


def load_corpus(paths: list[str]) -> list[str]:
    """Read texts from local .txt / .jsonl files. Loud on missing/empty."""
    texts: list[str] = []
    for path in paths:
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"calibration corpus not found at {path!r}. No network "
                f"access — export text locally (.txt = one document, "
                f".jsonl = rows with a 'text' or 'prompt' field)."
            )
        if path.endswith(".jsonl"):
            with open(path) as f:
                for line in f:
                    if not line.strip():
                        continue
                    row = json.loads(line)
                    t = row.get("text") or row.get("prompt") or ""
                    if t:
                        texts.append(t)
        else:
            with open(path) as f:
                t = f.read()
            if t.strip():
                texts.append(t)
    if not texts:
        raise ValueError(f"no non-empty documents in {paths!r}")
    return texts


def byte_encode(text: str) -> list[int]:
    """Deterministic byte-level fallback for tokenizer-less (tiny-random)
    models; ids stay under 256 so special ids above remain free."""
    return [b for b in text.encode("utf-8")]


def tokenize_and_pack(
    texts: list[str],
    encode,  # callable str -> list[int]; None = byte_encode
    seq_len: int,
    eos_id: int = 2,
    max_blocks: int = 0,
) -> np.ndarray:
    """Concatenate tokenized documents with an EOS separator and cut the
    stream into [N, seq_len] blocks (reference tokenize_and_pack: packing
    drops the final partial block rather than padding it)."""
    enc = encode or byte_encode
    stream: list[int] = []
    for t in texts:
        stream.extend(enc(t))
        stream.append(eos_id)
        if max_blocks and len(stream) >= (max_blocks + 1) * seq_len:
            break
    n = len(stream) // seq_len
    if n == 0:
        raise ValueError(
            f"corpus too small: {len(stream)} tokens < seq_len={seq_len}"
        )
    if max_blocks:
        n = min(n, max_blocks)
    blocks = np.asarray(stream[: n * seq_len], np.int32).reshape(n, seq_len)
    logger.info(
        "packed %d docs -> %d blocks of %d tokens (%d tokens dropped)",
        len(texts), n, seq_len, len(stream) - n * seq_len,
    )
    return blocks


class PackedCollator:
    """Seeded, epoch-reshuffled batches over packed blocks (reference
    training collator): iterating yields [batch, seq_len] int32 arrays;
    a partial final batch is dropped (static shapes for jit)."""

    def __init__(self, blocks: np.ndarray, batch_size: int, seed: int = 0):
        if batch_size > len(blocks):
            raise ValueError(
                f"batch_size {batch_size} > {len(blocks)} packed blocks"
            )
        self.blocks = blocks
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        order = self._rng.permutation(len(self.blocks))
        for i in range(0, len(order) - self.batch_size + 1,
                       self.batch_size):
            yield self.blocks[order[i : i + self.batch_size]]

    def __len__(self) -> int:
        return len(self.blocks) // self.batch_size


def prompts_from_files(paths: list[str], encode, seq_len: int,
                       num_prompts: int, eos_id: int = 2,
                       seed: int = 0) -> list[list[int]]:
    """Convenience for train_compressor: pack the corpus and pick
    ``num_prompts`` blocks (seeded, without replacement when possible)."""
    blocks = tokenize_and_pack(load_corpus(paths), encode, seq_len, eos_id)
    rng = np.random.default_rng(seed)
    if len(blocks) >= num_prompts:
        idx = rng.choice(len(blocks), num_prompts, replace=False)
    else:
        logger.info(
            "corpus has %d blocks < num_prompts=%d; sampling with "
            "replacement", len(blocks), num_prompts,
        )
        idx = rng.choice(len(blocks), num_prompts, replace=True)
    return [blocks[i].tolist() for i in idx]
