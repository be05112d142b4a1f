"""Integration-shaped test of the real Gemini client branch
(select/llm.py:make_gemini_client) against a fake `google.generativeai`
SDK that mirrors the surface the client touches — response.parts,
prompt_feedback.block_reason, quota (429) and transient exceptions —
because the real SDK can never run in this offline environment
(VERDICT round-1 missing #3). Retry/backoff semantics mirror
ref:scripts/activelearning_llm.py:301-345."""

import sys
import types

import pytest


class _Part:
    def __init__(self, text):
        self.text = text


class _Feedback:
    def __init__(self, block_reason):
        self.block_reason = block_reason


class _Response:
    def __init__(self, parts=(), block_reason=None):
        self.parts = list(parts)
        self.prompt_feedback = _Feedback(block_reason) \
            if block_reason is not None else None


@pytest.fixture
def fake_genai(monkeypatch):
    """Install a fake google.generativeai with a scriptable model."""
    genai = types.ModuleType("google.generativeai")
    state = {"configured_key": None, "model_name": None, "script": [],
             "calls": 0}

    def configure(api_key=None):
        state["configured_key"] = api_key

    class GenerativeModel:
        def __init__(self, name):
            state["model_name"] = name

        def generate_content(self, prompt):
            state["calls"] += 1
            action = state["script"].pop(0)
            if isinstance(action, Exception):
                raise action
            return action

    genai.configure = configure
    genai.GenerativeModel = GenerativeModel
    google_pkg = types.ModuleType("google")
    google_pkg.generativeai = genai
    monkeypatch.setitem(sys.modules, "google", google_pkg)
    monkeypatch.setitem(sys.modules, "google.generativeai", genai)
    monkeypatch.setenv("GEMINI_API_KEY", "test-key-123")
    return state


@pytest.fixture
def no_sleep(monkeypatch):
    slept = []
    monkeypatch.setattr("bayesvlm_tpu.select.llm.time.sleep",
                        lambda s: slept.append(s))
    return slept


def _client(**kw):
    from bayesvlm_tpu.select.llm import make_gemini_client

    return make_gemini_client(**kw)


def test_success_joins_parts(fake_genai, no_sleep):
    fake_genai["script"] = [_Response(parts=[_Part("The score is "),
                                             _Part("4")])]
    client = _client(model_name="gemini-pro")
    assert client("p") == "The score is 4"
    assert fake_genai["configured_key"] == "test-key-123"
    assert fake_genai["model_name"] == "gemini-pro"


def test_safety_block_returns_blocked_marker(fake_genai, no_sleep):
    from bayesvlm_tpu.select.llm import parse_llm_score

    fake_genai["script"] = [_Response(parts=[], block_reason="SAFETY")]
    client = _client()
    out = client("p")
    assert out == "BLOCKED: SAFETY"
    # downstream parse must turn a block into the default-score path
    assert parse_llm_score(out) is None


def test_empty_response_returns_none(fake_genai, no_sleep):
    fake_genai["script"] = [_Response(parts=[], block_reason=None)]
    assert _client()("p") is None


def test_quota_error_backs_off_linearly(fake_genai, no_sleep):
    fake_genai["script"] = [
        Exception("429 Resource has been exhausted"),
        Exception("Resource has been exhausted (quota)"),
        _Response(parts=[_Part("3")]),
    ]
    client = _client(retry_delay=5, max_retries=3)
    assert client("p") == "3"
    # ref backoff: retry_delay * (attempt+1) for quota errors
    assert no_sleep == [5, 10]


def test_transient_error_fixed_delay_then_success(fake_genai, no_sleep):
    fake_genai["script"] = [Exception("500 internal"),
                            _Response(parts=[_Part("2")])]
    client = _client(retry_delay=7, max_retries=3)
    assert client("p") == "2"
    assert no_sleep == [7]


def test_retries_exhausted_returns_none(fake_genai, no_sleep):
    fake_genai["script"] = [Exception("boom")] * 3
    client = _client(max_retries=3)
    assert client("p") is None
    assert fake_genai["calls"] == 3


def test_missing_api_key_raises(fake_genai, monkeypatch):
    monkeypatch.delenv("GEMINI_API_KEY")
    with pytest.raises(ValueError, match="GEMINI_API_KEY"):
        _client()


def test_select_llm_score_through_fake_sdk(fake_genai, no_sleep):
    """End-to-end: the selection loop driving the REAL client against
    the fake SDK — scores parse, a block falls back to default, rate
    limiting consults the clock."""
    import numpy as np

    from bayesvlm_tpu.select.llm import select_llm_score

    fake_genai["script"] = [
        _Response(parts=[_Part("5")]),
        _Response(parts=[], block_reason="SAFETY"),   # -> default 2.5
        _Response(parts=[_Part("1 is my score")]),
    ]
    client = _client()
    idx, scores = select_llm_score(
        image_ids=np.array([10, 11, 12]),
        image_class_ids=np.array([0, 1, 0]),
        class_prompts=["a cat", "a dog"],
        k=3, client=client, dataset_name="testset",
        sleep_fn=lambda s: None,
    )
    assert list(scores) == [5.0, 2.5, 1.0]
    assert list(idx) == [0, 1, 2]
