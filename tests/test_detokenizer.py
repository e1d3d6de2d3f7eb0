"""IncrementalDetokenizer unit tests.

Covers the reference's streaming detokenization contract
(entrypoints/openai/detokenizer.py:21-101): never emit a split multi-byte
codepoint, re-emit on merge-changed prefixes, flush on finish.
"""

from sparsevllm_tpu.entrypoints.openai.detokenizer import IncrementalDetokenizer


class ByteTokenizer:
    """Each token id is one UTF-8 byte — the adversarial case for streaming
    (every multi-byte codepoint is split across tokens)."""

    def decode(self, ids, skip_special_tokens=True):
        return bytes(ids).decode("utf-8", errors="replace")


class MergeTokenizer:
    """decode() is not prefix-stable: token 1 after 0 merges into 'AB!'."""

    def decode(self, ids, skip_special_tokens=True):
        if ids == [0]:
            return "Aa"
        if ids == [0, 1]:
            return "AB!"
        return "".join(chr(ord("A") + i) for i in ids)


def test_ascii_streams_per_token():
    d = IncrementalDetokenizer(ByteTokenizer())
    assert d.push(list(b"he")) == "he"
    assert d.push(list(b"llo")) == "llo"
    assert d.finish() == ""


def test_multibyte_held_back_until_complete():
    d = IncrementalDetokenizer(ByteTokenizer())
    raw = "é".encode("utf-8")  # 2 bytes
    assert d.push([raw[0]]) == ""  # incomplete -> hold back
    assert d.push([raw[1]]) == "é"


def test_four_byte_emoji_split_three_ways():
    d = IncrementalDetokenizer(ByteTokenizer())
    raw = "🎉".encode("utf-8")  # 4 bytes
    assert d.push([raw[0]]) == ""
    assert d.push([raw[1], raw[2]]) == ""
    assert d.push([raw[3]]) == "🎉"


def test_text_after_held_back_bytes_emits_together():
    d = IncrementalDetokenizer(ByteTokenizer())
    raw = "ü".encode("utf-8")
    assert d.push([raw[0]]) == ""
    assert d.push([raw[1]] + list(b"ber")) == "über"[-4:]


def test_complete_text_streams_past_trailing_partial():
    """Only the trailing incomplete codepoint is held back — complete text
    before it must stream immediately (ADVICE r2)."""
    d = IncrementalDetokenizer(ByteTokenizer())
    raw = "é".encode("utf-8")
    assert d.push(list(b"ok") + [raw[0]]) == "ok"
    tail = d.finish()
    assert tail == "�"  # the dangling byte flushes verbatim


def test_merge_changed_prefix_never_duplicates_streamed_text():
    """Streamed deltas cannot be retracted: a merge that rewrites already-
    emitted text must NOT re-emit it (a delta-concatenating SSE client
    would render the duplicate — ADVICE r2). We emit nothing for the
    diverged region instead (reference raises; documented divergence)."""
    d = IncrementalDetokenizer(MergeTokenizer())
    assert d.push([0]) == "Aa"
    # decode([0,1]) == 'AB!' does not extend 'Aa' -> suffix-silence
    assert d.push([1]) == ""
    assert d.finish() == ""


def test_push_after_finish_raises():
    d = IncrementalDetokenizer(ByteTokenizer())
    d.push(list(b"x"))
    d.finish()
    try:
        d.push(list(b"y"))
    except RuntimeError:
        pass
    else:
        raise AssertionError("push after finish must raise")


def test_empty_push_is_noop():
    d = IncrementalDetokenizer(ByteTokenizer())
    assert d.push([]) == ""
    assert d.push(list(b"x")) == "x"


def test_finish_idempotent_after_clean_stream():
    d = IncrementalDetokenizer(ByteTokenizer())
    d.push(list(b"done"))
    assert d.finish() == ""
    assert d.finish() == ""
