"""Property-based tests (hypothesis) over the pure-python cores."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gobulk_spark.functions import textstats
from gobulk_spark.functions.imaging import decode_png, encode_png, psnr, quantize_lossy
from gobulk_spark.functions.scrub import scrub_captions
from gobulk_spark.models import langid, perplexity

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 64), st.integers(1, 64), st.integers(0, 2**31 - 1))
def test_png_roundtrip_any_size(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=40, deadline=None)
@given(st.integers(8, 48), st.integers(8, 48), st.integers(0, 2**31 - 1))
def test_lossy_psnr_holds_for_any_content(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert psnr(img, quantize_lossy(img)) >= 40.0


@settings(max_examples=100, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=8))
def test_scrub_idempotent_on_arbitrary_text(texts):
    s = pd.Series(texts)
    once = scrub_captions(s)
    twice = scrub_captions(once)
    assert once.fillna("").tolist() == twice.fillna("").tolist()


@settings(max_examples=60, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=6))
def test_models_total_on_arbitrary_text(texts):
    """Models never raise and return finite, bounded scores for any input."""
    s = pd.Series(texts)
    lid = langid.predict(s)
    assert ((lid["lang_conf"] >= 0) & (lid["lang_conf"] <= 1)).all()
    ppl = perplexity.score(s)
    assert np.isfinite(ppl).all() and (ppl > 0).all()
    # and batch == singleton (no cross-row leakage) on arbitrary input
    one = langid.predict(s.iloc[:1])
    assert one["lang"].iloc[0] == lid["lang"].iloc[0]
    np.testing.assert_allclose(
        one["lang_conf"].iloc[0], lid["lang_conf"].iloc[0], rtol=0, atol=0
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=6))
def test_textstats_bounds(texts):
    s = pd.Series(texts)
    assert (textstats.symbol_ratio(s).between(0, 1)).all()
    assert (textstats.digit_ratio(s).between(0, 1)).all()
    assert (textstats.max_word_freq_ratio(s).between(0, 1)).all()
    assert (textstats.stopword_density(s).between(0, 1)).all()
    assert (textstats.n_words(s) <= textstats.n_chars(s) + 1).all()
