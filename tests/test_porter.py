"""Porter stemmer (text/porter.py) vs canonical outputs of the published
algorithm (Porter 1980), + the METEOR stem-stage integration."""

import numpy as np

from grounded_video_llm_tpu.text.porter import porter_stem

# canonical (word, stem) pairs: the paper's step examples run through the
# FULL algorithm, plus widely-published reference outputs
CANONICAL = [
    # step 1a
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    # step 1b + cleanup rules
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("sized", "size"), ("hopping", "hop"), ("tanned", "tan"),
    ("falling", "fall"), ("hissing", "hiss"), ("fizzed", "fizz"),
    ("failing", "fail"), ("filing", "file"), ("died", "di"),
    ("denied", "deni"), ("owned", "own"), ("meetings", "meet"),
    # step 1c
    ("happy", "happi"), ("sky", "sky"),
    # step 2 (often completed by steps 4/5)
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("valency", "valenc"), ("hesitancy", "hesit"),
    ("digitizer", "digit"), ("conformably", "conform"),
    ("radically", "radic"), ("differently", "differ"),
    ("vileness", "vile"), ("analogously", "analog"),
    ("vietnamization", "vietnam"), ("predication", "predic"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formality", "formal"),
    ("sensitivity", "sensit"), ("sensibility", "sensibl"),
    # step 3
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"), ("electricity", "electr"),
    ("electrical", "electr"), ("hopeful", "hope"), ("goodness", "good"),
    # step 4
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("communism", "commun"),
    ("activate", "activ"), ("angularity", "angular"),
    ("homologous", "homolog"), ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    # step 5
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controll", "control"), ("roll", "roll"),
    # common morphology
    ("running", "run"), ("runs", "run"),
]


def test_canonical_pairs():
    bad = [(w, porter_stem(w), want) for w, want in CANONICAL
           if porter_stem(w) != want]
    assert not bad, bad


def test_short_words_and_case():
    assert porter_stem("a") == "a"
    assert porter_stem("at") == "at"
    assert porter_stem("Running") == "run"  # lowercases


def test_idempotent_on_stems():
    # a second application must not strip further for these
    for w, s in CANONICAL[:20]:
        assert porter_stem(s) in (s, porter_stem(s))


def test_meteor_stem_stage_aligns_morphology():
    from grounded_video_llm_tpu.serve.captioning import meteor_score

    # cats~cat and running~runs only match through the stem stage
    with_stems = meteor_score("the cats are running", "the cat runs")
    assert with_stems > meteor_score("the felines are sprinting",
                                     "the cat runs")
    # hand check: hyp 4 words, ref 3; matches = the(exact) + cats/cat +
    # running/runs (stems) = 3 -> P=3/4 R=3/3, F=10PR/(R+9P)
    p, r = 3 / 4, 1.0
    f_mean = 10 * p * r / (r + 9 * p)
    # alignment (0,0)(1,1)(3,2): chunks = 2 -> penalty 0.5*(2/3)^3
    want = f_mean * (1 - 0.5 * (2 / 3) ** 3)
    np.testing.assert_allclose(with_stems, want, rtol=1e-9)


def test_meteor_exact_paths_unchanged():
    from grounded_video_llm_tpu.serve.captioning import meteor_score

    # identical sentences still score f_mean with no fragmentation penalty...
    s = meteor_score("the cat sat", "the cat sat")
    np.testing.assert_allclose(s, 1.0 * (1 - 0.5 * (1 / 3) ** 3))
    # ...and fully-disjoint sentences (disjoint stems too) still score 0
    assert meteor_score("alpha beta", "gamma delta") == 0.0
