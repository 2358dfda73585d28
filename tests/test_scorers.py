"""CIDEr-D and METEOR scorer sanity + property tests."""

import numpy as np
import pytest

from gpt2_vision_language_tpu.eval.cider import CiderScorer
from gpt2_vision_language_tpu.eval.meteor import meteor_score, meteor_single


def _corpus():
    gts = {
        0: ["a cat sits on the mat", "a cat is on a mat", "the cat on the mat"],
        1: ["a man rides a horse", "a person riding a horse", "man on a horse"],
        2: ["two dogs play in the park", "dogs playing at a park"],
    }
    return gts


def test_cider_perfect_match_scores_high():
    gts = _corpus()
    res = {k: [v[0]] for k, v in gts.items()}
    score, per_img = CiderScorer().compute_score(gts, res)
    assert score > 3.0, score  # perfect matches score high (scale ~10)
    assert len(per_img) == 3


def test_cider_garbage_scores_low():
    gts = _corpus()
    res = {k: ["zzz qqq www"] for k in gts}
    score, _ = CiderScorer().compute_score(gts, res)
    assert score < 0.01


def test_cider_ranks_better_captions_higher():
    gts = _corpus()
    good = {0: ["a cat sits on the mat"], 1: ["a man rides a horse"],
            2: ["two dogs play in the park"]}
    partial = {0: ["a cat"], 1: ["a man"], 2: ["two dogs"]}
    s_good, _ = CiderScorer().compute_score(gts, good)
    s_partial, _ = CiderScorer().compute_score(gts, partial)
    assert s_good > s_partial > 0


def test_cider_length_penalty():
    """Same n-gram content, wildly different length -> penalized.
    (Needs a multi-image corpus: with one image idf = log(1) = 0 and every
    score is 0 — matches upstream pycocoevalcap behavior.)"""
    gts = dict(_corpus())
    gts[3] = ["a cat on a mat", "a cat sitting on a mat"]
    base = {k: [v[0]] for k, v in _corpus().items()}
    short = dict(base)
    short[3] = ["a cat on a mat"]
    long = dict(base)
    long[3] = ["a cat on a mat " * 6]
    s_short = CiderScorer().compute_score(gts, short)[1][3]
    s_long = CiderScorer().compute_score(gts, long)[1][3]
    assert s_short > s_long


def test_meteor_exact_match():
    assert meteor_single("a cat on a mat", ["a cat on a mat"]) > 0.99


def test_meteor_stem_match():
    """'riding' vs 'rides' must match through the stemmer."""
    with_stem = meteor_single("a man riding a horse", ["a man rides a horse"])
    no_overlap = meteor_single("completely different words", ["a man rides a horse"])
    assert with_stem > 0.8
    assert no_overlap == 0.0


def test_meteor_word_order_penalty():
    in_order = meteor_single("a cat sat on the mat", ["a cat sat on the mat"])
    shuffled = meteor_single("mat the on sat cat a", ["a cat sat on the mat"])
    assert in_order > shuffled > 0


def test_meteor_corpus():
    gts = _corpus()
    res = {k: [v[0]] for k, v in gts.items()}
    mean, per = meteor_score(gts, res)
    assert mean > 0.99 and len(per) == 3


def test_meteor_synonym_stage():
    """Synonym matches (shared group: bicycle/bike, man/guy) must raise the
    score above stem-only matching (round-1 documented gap, now closed)."""
    from gpt2_vision_language_tpu.eval.synonyms import parse_groups

    syn = meteor_single("a man riding a bicycle", ["a guy riding a bike"])
    no_syn = meteor_single(
        "a man riding a bicycle",
        ["a guy riding a bike"],
        syn_table=parse_groups([]),  # empty table disables the stage
    )
    assert syn > no_syn
    assert syn > 0.9, syn  # all 5 unigrams align (2 via synonyms)


def test_synonym_table_env_file(tmp_path, monkeypatch):
    from gpt2_vision_language_tpu.eval import synonyms

    f = tmp_path / "syn.txt"
    f.write_text("frobnicate, twiddle\nxyzzy plugh\n")
    monkeypatch.setenv("METEOR_SYNONYMS", str(f))
    table = synonyms.load_synonym_table()
    assert synonyms.synonym_match("frobnicate", "twiddle", table)
    assert synonyms.synonym_match("xyzzy", "plugh", table)
    assert not synonyms.synonym_match("frobnicate", "plugh", table)


def test_synonym_match_is_groupwise():
    from gpt2_vision_language_tpu.eval.synonyms import (
        load_synonym_table,
        synonym_match,
    )

    table = load_synonym_table()
    assert synonym_match("couch", "sofa", table)
    assert synonym_match("photo", "picture", table)
    assert not synonym_match("couch", "photo", table)
    assert not synonym_match("unknownword", "sofa", table)


def test_wordnet_export_when_available():
    """Full-WordNet table export (networked machines); skips air-gapped."""
    import pytest

    from gpt2_vision_language_tpu.eval import synonyms

    try:
        groups = synonyms.wordnet_groups()
    except Exception:
        pytest.skip("NLTK wordnet corpus not installed (air-gapped)")
    table = synonyms.parse_groups(" ".join(g) for g in groups)
    assert synonyms.synonym_match("car", "automobile", table)
