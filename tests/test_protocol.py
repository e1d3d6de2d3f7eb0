"""OpenAI protocol parsing/validation unit tests.

Pins the request-validation contract (reference entrypoints/openai/protocol
pydantic schemas + serving/response_parsing.py) that the aiohttp server
enforces by hand.
"""

import pytest

from sparsevllm_tpu.entrypoints.openai.protocol import (
    ChatRequest,
    CompletionRequest,
    ProtocolError,
    ResponsesRequest,
    parse_reasoning,
    sampling_from_request,
)


# --- sampling_from_request -------------------------------------------------

def test_sampling_defaults():
    sp = sampling_from_request({}, default_max_tokens=77)
    assert sp.temperature == 1.0 and sp.top_p == 1.0 and sp.top_k == 0
    assert sp.max_tokens == 77 and sp.stop == () and sp.logprobs is None


def test_max_completion_tokens_alias():
    sp = sampling_from_request({"max_completion_tokens": 5})
    assert sp.max_tokens == 5


def test_max_tokens_must_be_positive_int():
    with pytest.raises(ProtocolError):
        sampling_from_request({"max_tokens": 0})
    with pytest.raises(ProtocolError):
        sampling_from_request({"max_tokens": "8"})


def test_stop_string_normalized_to_tuple():
    assert sampling_from_request({"stop": "END"}).stop == ("END",)
    assert sampling_from_request({"stop": ["a", "b"]}).stop == ("a", "b")
    with pytest.raises(ProtocolError):
        sampling_from_request({"stop": [1, 2]})


def test_chat_style_logprobs_true_plus_top_logprobs():
    sp = sampling_from_request({"logprobs": True, "top_logprobs": 3})
    assert sp.logprobs == 3
    assert sampling_from_request({"logprobs": False}).logprobs is None


def test_logprobs_range_enforced():
    with pytest.raises(ProtocolError):
        sampling_from_request({"logprobs": 21})
    with pytest.raises(ProtocolError):
        sampling_from_request({"logprobs": "many"})


def test_wrong_field_type_rejected():
    with pytest.raises(ProtocolError, match="temperature"):
        sampling_from_request({"temperature": "hot"})


def test_int_accepted_where_float_expected():
    assert sampling_from_request({"temperature": 0}).greedy


# --- CompletionRequest / ChatRequest ----------------------------------------

def test_completion_accepts_string_and_token_list_prompts():
    r = CompletionRequest.from_body({"prompt": "hi"}, 16)
    assert r.prompt == "hi" and r.request_id.startswith("cmpl-")
    r2 = CompletionRequest.from_body({"prompt": [1, 2, 3]}, 16)
    assert r2.prompt == [1, 2, 3]
    with pytest.raises(ProtocolError):
        CompletionRequest.from_body({"prompt": [1, "x"]}, 16)
    with pytest.raises(ProtocolError):
        CompletionRequest.from_body({}, 16)


def test_chat_requires_nonempty_messages_with_roles():
    with pytest.raises(ProtocolError):
        ChatRequest.from_body({"messages": []}, 16)
    with pytest.raises(ProtocolError):
        ChatRequest.from_body({"messages": [{"content": "hi"}]}, 16)
    r = ChatRequest.from_body(
        {"messages": [{"role": "user", "content": "hi"}], "stream": True}, 16
    )
    assert r.stream and r.request_id.startswith("chatcmpl-")


# --- Responses API ----------------------------------------------------------

def test_responses_string_input_becomes_user_message():
    r = ResponsesRequest.from_body({"input": "ping"}, 16)
    assert r.input_items == [{"role": "user", "content": "ping"}]


def test_responses_instructions_prepended_as_system():
    r = ResponsesRequest.from_body(
        {"input": "q", "instructions": "be terse"}, 16
    )
    assert r.input_items[0] == {"role": "system", "content": "be terse"}


def test_responses_content_parts_concatenated():
    r = ResponsesRequest.from_body(
        {
            "input": [
                {
                    "role": "user",
                    "content": [
                        {"type": "input_text", "text": "a"},
                        {"type": "text", "text": "b"},
                    ],
                }
            ]
        },
        16,
    )
    assert r.input_items == [{"role": "user", "content": "ab"}]


def test_responses_unsupported_content_part_rejected():
    """Non-text modalities must 4xx, not silently drop (ADVICE r2)."""
    with pytest.raises(ProtocolError, match="unsupported content part"):
        ResponsesRequest.from_body(
            {
                "input": [
                    {
                        "role": "user",
                        "content": [
                            {"type": "input_text", "text": "a"},
                            {"type": "image", "image_url": "http://x"},
                        ],
                    }
                ]
            },
            16,
        )


def test_responses_max_output_tokens_alias():
    r = ResponsesRequest.from_body({"input": "x", "max_output_tokens": 9}, 16)
    assert r.sampling.max_tokens == 9


def test_responses_missing_input_rejected():
    with pytest.raises(ProtocolError, match="input"):
        ResponsesRequest.from_body({}, 16)
    with pytest.raises(ProtocolError):
        ResponsesRequest.from_body({"input": [{"content": "no role"}]}, 16)


# --- reasoning parsing --------------------------------------------------------

def test_parse_reasoning_splits_think_block():
    reasoning, content = parse_reasoning("<think>plan</think>\nanswer")
    assert reasoning == "plan" and content == "answer"


def test_parse_reasoning_unterminated_is_all_reasoning():
    reasoning, content = parse_reasoning("<think>still going")
    assert reasoning == "still going" and content == ""


def test_parse_reasoning_absent_block_passthrough():
    reasoning, content = parse_reasoning("plain answer")
    assert reasoning is None and content == "plain answer"
