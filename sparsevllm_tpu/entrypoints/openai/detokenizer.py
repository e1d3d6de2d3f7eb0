"""Incremental UTF-8-safe detokenization.

Re-expresses reference entrypoints/openai/detokenizer.py:21-101: stream
token ids, emit only complete text (never split a multi-byte codepoint or a
multi-token grapheme), by re-decoding the accumulated ids and diffing.

Streaming contract (ADVICE r2 — deltas, once emitted, CANNOT be retracted):
  * Only the TRAILING run of replacement chars (an incomplete multi-byte
    sequence under errors='replace') is held back; complete text before it
    streams immediately. A genuine U+FFFD vocab token therefore streams as
    soon as any text follows it (or at finish()).
  * If a merge changes already-emitted text (decode is not prefix-stable),
    push() emits NOTHING for the diverged region — the already-streamed
    deltas stay authoritative; the reference raises a hard error here
    (detokenizer.py:80-89), we degrade to suffix-silence instead so a rare
    tokenizer merge does not kill a production stream.
  * finish() is IDEMPOTENT (intentional divergence from the reference's
    raise-on-reuse: the dispatcher may flush on both finish and cancel
    paths); push() after finish() raises.
"""

from __future__ import annotations

_REPL = "�"


class IncrementalDetokenizer:
    """Push token ids, get printable text deltas."""

    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip_special = skip_special_tokens
        self.token_ids: list[int] = []
        self._emitted_text = ""
        self._finished = False

    def _decode(self) -> str:
        return self.tokenizer.decode(
            self.token_ids, skip_special_tokens=self.skip_special
        )

    def push(self, token_ids: list[int]) -> str:
        """Add tokens; return the newly printable text (may be '')."""
        if self._finished:
            raise RuntimeError("push() after finish()")
        self.token_ids.extend(token_ids)
        text = self._decode()
        # hold back ONLY the trailing incomplete-codepoint run; everything
        # before it is stable and streams now.
        n = len(text)
        while n > 0 and text[n - 1] == _REPL:
            n -= 1
        stable = text[:n]
        if not stable.startswith(self._emitted_text):
            # merge changed already-streamed text: emitted deltas cannot be
            # retracted — emit nothing and wait for the decode to re-extend
            # the emitted prefix (module docstring).
            return ""
        delta = stable[len(self._emitted_text):]
        self._emitted_text = stable
        return delta

    def finish(self) -> str:
        """Flush any held-back text (replacement chars included verbatim).

        Idempotent; emits '' if the final decode diverged from the
        already-streamed prefix (nothing sane can be appended)."""
        self._finished = True
        text = self._decode()
        if not text.startswith(self._emitted_text):
            return ""
        delta = text[len(self._emitted_text):]
        self._emitted_text = text
        return delta
