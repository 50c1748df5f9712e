"""Slot-level streaming: per-token callbacks from the continuous server and
incremental detokenization (text/streaming.TokenTextStream)."""

import jax
import numpy as np

from grounded_video_llm_tpu.core.config import micro_vlm_config
from grounded_video_llm_tpu.models import vlm
from grounded_video_llm_tpu.serve.continuous import ContinuousServer, Request
from grounded_video_llm_tpu.text.streaming import TokenTextStream
from grounded_video_llm_tpu.text.tokenizer import load_tokenizer
from grounded_video_llm_tpu.text.templates import IMAGE_TOKEN_INDEX

EOS, PAD = 2, 0


def test_on_token_streams_exactly_the_results():
    """Every request's callback must receive exactly its final token list,
    in order, as chunks land — including the admission-time first token."""
    cfg = micro_vlm_config("phi3.5")
    params = vlm.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(11)
    streamed = {i: [] for i in range(3)}
    reqs = []
    for i in range(3):
        ids = rng.integers(3, 50, size=(10,)).astype(np.int32)
        ids[2] = IMAGE_TOKEN_INDEX
        reqs.append(Request(
            input_ids=ids, attn_mask=np.ones((10,), np.int32),
            spatial_pixels=rng.normal(size=(cfg.num_segs, 336, 336, 3)
                                      ).astype(np.float32) * 0.1,
            temporal_pixels=rng.normal(size=(cfg.num_frames, 224, 224, 3)
                                       ).astype(np.float32) * 0.1,
            max_new_tokens=3 + 2 * i,          # ragged budgets
            on_token=streamed[i].append))
    server = ContinuousServer(params, cfg, pool_size=2, prompt_len=10,
                              max_new_tokens=8, chunk=2, temperature=0.0,
                              do_sample=False, eos_token_id=EOS,
                              pad_token_id=PAD)
    results = server.serve(reqs)
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(streamed[i], np.int32), results[i])


def test_token_text_stream_matches_whole_decode():
    """Deltas concatenated == whole-sequence decode, for ascii and
    multi-byte text split across byte-level tokens."""
    tok = load_tokenizer("phi3.5", None, 300)
    for text in ("hello world, 12.5 seconds",
                 "温度 is 25°C — ok ✓",
                 "emoji 🎥🎬 end"):
        ids = tok.encode(text)
        stream = TokenTextStream(tok)
        deltas = [stream.push(t) for t in ids]
        final = "".join(deltas) + stream.flush()
        assert final == tok.decode(ids, skip_special_tokens=True)
        # deltas must never contain a replacement char (held back instead)
        assert all("�" not in d for d in deltas)


def test_token_text_stream_callback():
    tok = load_tokenizer("phi3.5", None, 300)
    got = []
    stream = TokenTextStream(tok, on_text=got.append)
    ids = tok.encode("streaming ok")
    for t in ids:
        stream.push(t)
    stream.flush()
    assert "".join(got) == tok.decode(ids, skip_special_tokens=True)
    assert stream.text == "".join(got)
