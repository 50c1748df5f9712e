"""Dense-captioning scorers: METEOR (exact-match), SODA_c, parsers, driver."""

import numpy as np
import pytest

from grounded_video_llm_tpu.serve.captioning import (
    dense_caption_meteor, dense_captioning_summary, meteor_score,
    parse_dense_captions, soda_c, _monotone_dp)


def test_meteor_identical():
    # m=3 matches, P=R=1, F=1, chunks=1 → penalty 0.5*(1/3)^3
    s = meteor_score("the cat sat", "the cat sat")
    np.testing.assert_allclose(s, 1.0 - 0.5 / 27, rtol=1e-9)


def test_meteor_disjoint_and_empty():
    assert meteor_score("alpha beta", "gamma delta") == 0.0
    assert meteor_score("", "a b") == 0.0
    assert meteor_score("a b", "") == 0.0


def test_meteor_partial_hand_computed():
    # hyp "the cat", ref "the dog": m=1, P=R=0.5,
    # F = 10*0.25/(0.5+4.5) = 0.5; chunks=1 → penalty 0.5 → 0.25
    np.testing.assert_allclose(meteor_score("the cat", "the dog"), 0.25,
                               rtol=1e-9)


def test_meteor_fragmentation_penalty():
    """Same words, scrambled order → more chunks → lower score."""
    inorder = meteor_score("a b c d", "a b c d")
    scrambled = meteor_score("c d a b", "a b c d")
    assert scrambled < inorder
    # scrambled: m=4, F=1, chunks=2 → 1 - 0.5*(2/4)^3 = 1 - 0.0625
    np.testing.assert_allclose(scrambled, 1.0 - 0.5 * 0.125, rtol=1e-9)


def test_parse_dense_captions():
    text = "<0> <150> a man runs. <150> <300> he jumps"
    caps = parse_dense_captions(text, duration=10.0)
    assert len(caps) == 2
    (iv0, s0), (iv1, s1) = caps
    np.testing.assert_allclose(iv0, (0.0, 5.0))
    np.testing.assert_allclose(iv1, (5.0, 10.0))
    assert s0 == "a man runs."
    assert s1 == "he jumps"


def test_parse_dense_captions_with_to_and_noise():
    caps = parse_dense_captions("Sure! <30> to <60> a dog barks", 100.0)
    assert caps == [((10.0, 20.0), "a dog barks")]
    assert parse_dense_captions("no tokens here", 10.0) == []


def test_monotone_dp_blocks_crossing_pairs():
    # crossing high scores: only one can be taken monotonically
    score = [[0.0, 1.0],
             [1.0, 0.0]]
    assert _monotone_dp(score) == 1.0
    # diagonal pairs both taken
    assert _monotone_dp([[1.0, 0.0], [0.0, 1.0]]) == 2.0


def test_soda_c_perfect_and_order_violation():
    gts = [((0.0, 5.0), "a man runs"), ((5.0, 10.0), "he jumps high")]
    per_pair = meteor_score("a man runs", "a man runs")
    f_perfect = soda_c(gts, gts)
    # P=R=mean meteor of aligned pairs ≈ per-pair scores
    assert f_perfect > 0.9
    # story order violated: same captions, sequence reversed → DP keeps one
    swapped = [gts[1], gts[0]]
    f_swapped = soda_c(swapped, gts)
    assert f_swapped < f_perfect / 1.5
    assert f_swapped > 0.0
    del per_pair


def test_soda_c_requires_temporal_overlap():
    gts = [((0.0, 5.0), "a man runs")]
    preds = [((50.0, 60.0), "a man runs")]  # right words, wrong time
    assert soda_c(preds, gts) == 0.0


def test_dense_caption_meteor_thresholds():
    gt = [((0.0, 10.0), "the cat sat")]
    # pred interval [0, 6]: IoU 0.6 → matches at t=0.3,0.5 only (2 of 4)
    pred = [((0.0, 6.0), "the cat sat")]
    full = meteor_score("the cat sat", "the cat sat")
    got = dense_caption_meteor(pred, gt)
    np.testing.assert_allclose(got, full * 2 / 4, rtol=1e-9)


def test_dense_captioning_summary_scale():
    gts = [[((0.0, 5.0), "a man runs")]]
    out = dense_captioning_summary(gts, gts)
    assert set(out) == {"SODA_c", "METEOR"}
    assert 90.0 < out["SODA_c"] <= 100.0
    # METEOR averaged over 4 thresholds with IoU 1.0 → full meteor
    assert 90.0 < out["METEOR"] <= 100.0
    assert dense_captioning_summary([], []) == {"SODA_c": 0.0, "METEOR": 0.0}


def test_eval_dense_captioning_driver_on_fake_engine(tmp_path):
    """Driver arithmetic without a model: stub engine returning canned text."""
    from grounded_video_llm_tpu.serve.captioning import eval_dense_captioning

    class _Res:
        def __init__(self, text, duration):
            self.text = text
            self.duration = duration

    class _Cfg:
        num_temporal_tokens = 300

    class _Eng:
        cfg = _Cfg()

        def run_stream(self, paths, prompts, mode, batch_size):
            assert mode == "grounding"
            return [_Res("<0> <150> a man runs. <150> <300> he jumps high",
                         10.0) for _ in paths]

    annos = {"v_abc": {"duration": 10.0,
                       "timestamps": [[0.0, 5.0], [5.0, 10.0]],
                       "sentences": ["a man runs", "he jumps high"]}}
    out = eval_dense_captioning(_Eng(), annos, video_root="/x")
    assert out["SODA_c"] > 90.0
    assert out["METEOR"] > 90.0
