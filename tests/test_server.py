"""HTTP serving front-end (serve/server.py): JSON generate + SSE streaming
over the continuous-batching scheduler, driven through a real socket."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from grounded_video_llm_tpu.core.config import (GenerateConfig,
                                                micro_vlm_config)
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.serve.engine import InferenceEngine
from grounded_video_llm_tpu.serve.server import ServingFrontend, serve_http
from grounded_video_llm_tpu.text.tokenizer import build_test_tokenizer


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path_factory.mktemp("vids")
    p = str(d / "v.mp4")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 64))
    for i in range(24):
        f = np.zeros((64, 64, 3), np.uint8)
        f[:] = (30, 20 + 5 * (i % 8), 180)
        w.write(f)
    w.release()
    return p


@pytest.fixture(scope="module")
def http_server(videos):
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    tok = build_test_tokenizer("phi3.5")
    eng = InferenceEngine(
        params, cfg, tok,
        GenerateConfig(max_new_tokens=6, do_sample=False, temperature=0.0),
        feature_cache_size=4)
    frontend = ServingFrontend(eng, pool_size=2, prompt_len=32,
                               max_new_tokens=6, chunk=2)
    httpd = serve_http(frontend, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()
    frontend.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, json.loads(r.read())


def _post(url, body, timeout=600):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read()


def test_health_and_models(http_server):
    code, h = _get(http_server + "/healthz")
    assert code == 200 and h["status"] == "ok" and h["model"] == "phi3.5"
    code, m = _get(http_server + "/v1/models")
    assert code == 200
    assert m["data"][0]["modes"] == ["qa", "grounding", "referring"]


def test_generate_roundtrip_deterministic(http_server, videos):
    body = {"video_path": videos, "prompt": "what happens?",
            "mode": "grounding"}
    code, raw = _post(http_server + "/v1/generate", body)
    assert code == 200
    out = json.loads(raw)
    assert set(out) >= {"text", "parsed", "intervals", "duration",
                        "num_tokens"}
    assert out["num_tokens"] > 0 and out["duration"] > 0
    # greedy server → identical repeat (also exercises the feature-cache hit)
    _, raw2 = _post(http_server + "/v1/generate", body)
    assert json.loads(raw2)["text"] == out["text"]


def test_streaming_deltas_assemble_final_text(http_server, videos):
    body = {"video_path": videos, "prompt": "what happens?", "mode": "qa",
            "stream": True}
    req = urllib.request.Request(
        http_server + "/v1/generate", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    deltas, final = [], None
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "text/event-stream"
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            obj = json.loads(payload)
            if obj.get("done"):
                final = obj
            else:
                deltas.append(obj["delta"])
    assert final is not None
    assert "".join(deltas).strip() == final["text"]

    # non-streamed text for the same request matches (greedy)
    _, raw = _post(http_server + "/v1/generate",
                   {"video_path": videos, "prompt": "what happens?",
                    "mode": "qa"})
    assert json.loads(raw)["text"] == final["text"]


def test_prefix_cache_server_matches_plain(videos):
    """A prefix_cache=True frontend (prefix-KV admission: question-chunk
    prefill against the per-video cached head) returns the same greedy text
    as a plain feature-backed frontend, and reuses the cached prefix on
    repeats. Both frontends use a bucket wide enough to hold the full
    prompt — with a NARROW bucket the plain path tail-truncates the prompt
    head while the prefix path keeps it (whole pre-image text lives in the
    prefix), so their effective prompts legitimately differ."""
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    tok = build_test_tokenizer("phi3.5")
    eng = InferenceEngine(
        params, cfg, tok,
        GenerateConfig(max_new_tokens=6, do_sample=False, temperature=0.0),
        feature_cache_size=4)
    body = {"video_path": videos, "prompt": "what happens?", "mode": "qa"}
    texts = {}
    for name, use_prefix, shared in (("plain", False, False),
                                     ("prefix", True, False),
                                     ("shared", True, True)):
        frontend = ServingFrontend(eng, pool_size=2, prompt_len=256,
                                   max_new_tokens=6, chunk=2,
                                   prefix_cache=use_prefix,
                                   shared_prefix_pool=shared)
        httpd = serve_http(frontend, "127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            _, raw1 = _post(base + "/v1/generate", body)
            _, raw2 = _post(base + "/v1/generate", body)
            texts[name] = json.loads(raw1)["text"]
            assert json.loads(raw2)["text"] == texts[name]
        finally:
            httpd.shutdown()
            frontend.shutdown()
    assert len(eng._prefix_cache) == 1  # prefix LRU hit on the repeat
    assert texts["prefix"] == texts["plain"]
    # cascade pool (shared_prefix_pool=True: pinned batch-1 prefix +
    # per-slot tails) serves the same greedy text through the HTTP path
    assert texts["shared"] == texts["plain"]


def test_bad_requests(http_server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server + "/v1/generate", {"prompt": "no video"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http_server + "/nope", {})
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(http_server + "/nope")
    assert e.value.code == 404
