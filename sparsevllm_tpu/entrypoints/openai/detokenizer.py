"""Incremental UTF-8-safe detokenization.

Re-expresses reference entrypoints/openai/detokenizer.py:21-101: stream
token ids, emit only complete text (never split a multi-byte codepoint or a
multi-token grapheme), by re-decoding a sliding tail window and diffing.
"""

from __future__ import annotations

_REPL = "�"


class IncrementalDetokenizer:
    """Push token ids, get printable text deltas."""

    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip_special = skip_special_tokens
        self.token_ids: list[int] = []
        # index of the first token not yet covered by emitted text
        self._emitted_upto = 0
        self._emitted_text = ""

    def push(self, token_ids: list[int]) -> str:
        """Add tokens; return the newly printable text (may be '')."""
        self.token_ids.extend(token_ids)
        # re-decode from the last stable point; tokenizers are not
        # prefix-stable across merges, so decode the whole tail.
        text = self.tokenizer.decode(
            self.token_ids, skip_special_tokens=self.skip_special
        )
        if text.endswith(_REPL):
            # an incomplete multi-byte sequence: hold back until complete.
            return ""
        if not text.startswith(self._emitted_text):
            # merge changed earlier text (rare); re-emit the diff point.
            delta = text
            self._emitted_text = text
            return delta
        delta = text[len(self._emitted_text):]
        self._emitted_text = text
        return delta

    def finish(self) -> str:
        """Flush any held-back text (replacement chars included verbatim)."""
        text = self.tokenizer.decode(
            self.token_ids, skip_special_tokens=self.skip_special
        )
        delta = text[len(self._emitted_text):]
        self._emitted_text = text
        return delta
