"""Rule-engine + reference-labeler contracts over the synthetic corpus."""

import numpy as np
import pandas as pd
import pytest

from gobulk_spark import reference_labeler as rl
from gobulk_spark.corpus import generate_pairs
from gobulk_spark.functions.scrub import scrub_captions
from gobulk_spark.rules import RULE_ORDER


@pytest.fixture(scope="module")
def corpus():
    pairs_t, planted_t = generate_pairs(3000, seed=42)
    return pairs_t.to_pandas(), planted_t.to_pandas()


@pytest.fixture(scope="module")
def labeled(corpus):
    pairs, planted = corpus
    return rl.label(pairs).merge(planted, on="image_id"), pairs


EXPECTED_RULE = {
    "too_short": {"too_short_chars", "caption_missing", "too_few_words"},
    "too_long": {"too_long_chars"},
    "symbol_soup": {"high_symbol_ratio"},
    "digit_soup": {"high_digit_ratio"},
    "char_run": {"char_repetition"},
    "word_rep": {"word_repetition"},
    "no_stopwords": {"low_stopword_density"},
    "unknown_lang": {"lang_conf_low", "lang_not_allowed", "high_perplexity"},
    "toxic": {"toxicity"},
    "img_small": {"image_too_small"},
    "img_aspect": {"bad_aspect_ratio"},
    "img_meta_mismatch": {"image_meta_mismatch"},
    "img_flat": {"image_flat"},
    "img_dark": {"image_bad_exposure"},
    "dup_exact": {"duplicate"},
}


def test_planted_defects_fire_expected_rules(labeled):
    df, _ = labeled
    for planted, allowed in EXPECTED_RULE.items():
        sub = df[df["planted"] == planted]
        assert len(sub) > 0, planted
        fired = set(sub["drop_reason"].dropna())
        assert fired <= allowed, f"{planted}: unexpected rules {fired - allowed}"
        assert not sub["keep"].any(), f"{planted}: rows kept"


def test_clean_rows_kept(labeled):
    df, _ = labeled
    clean = df[df["planted"] == "clean"]
    assert clean["keep"].all()


def test_pii_rows_kept_and_scrubbed(labeled):
    df, _ = labeled
    pii = df[df["planted"].str.startswith("pii_")]
    assert pii["keep"].mean() > 0.95  # PII itself never causes a drop
    kept = pii[pii["keep"]]
    assert kept["scrubbed_caption"].str.contains(r"<(?:EMAIL|PHONE|SSN|IP|CC)>").all()
    # no raw PII survives
    assert not kept["scrubbed_caption"].str.contains(r"@.*\.(?:com|org)").any()
    assert not kept["scrubbed_caption"].str.contains(r"\d{3}-\d{2}-\d{4}").any()


def test_corrupt_images_become_issues(labeled):
    df, _ = labeled
    bad = df[df["planted"] == "img_corrupt"]
    assert (~bad["decode_ok"]).all()
    assert bad["drop_reason"].isna().all()
    assert not bad["keep"].any()
    assert bad["issue_note"].notna().all()


def test_word_soup_fires_high_perplexity(labeled):
    df, _ = labeled
    soup = df[df["planted"] == "word_soup_ppl"]
    fired = soup["drop_reason"].dropna()
    assert (fired == "high_perplexity").all()
    assert len(fired) / len(soup) > 0.9  # a few random shuffles may read fine


def test_duplicate_keeps_exactly_first(labeled):
    df, pairs = labeled
    dups = df[df["planted"] == "dup_exact"]
    assert (dups["drop_reason"] == "duplicate").all()
    # each duplicate's content hash has exactly one non-duplicate owner
    owners = df[~df["is_duplicate"]].set_index("content_hash")["image_id"]
    assert dups["content_hash"].isin(owners.index).all()


def test_scrub_is_idempotent_and_ordered():
    s = pd.Series(
        [
            "mail a.b@c.de or call 555-123-4567",
            "card 4111 1111 1111 1234 then 192.168.1.1",
            None,
        ]
    )
    once = scrub_captions(s)
    twice = scrub_captions(once)
    assert once.tolist() == twice.tolist()
    assert once[1] == "card <CC> then <IP>"  # CC masked before phone could eat it


def test_rule_order_is_total_and_stable():
    assert len(RULE_ORDER) == len(set(RULE_ORDER))
    assert RULE_ORDER[0] == "caption_missing"
    assert RULE_ORDER.index("lang_conf_low") < RULE_ORDER.index("low_stopword_density")
    assert RULE_ORDER.index("low_stopword_density") < RULE_ORDER.index("high_perplexity")


def test_corpus_deterministic():
    a, _ = generate_pairs(200, seed=7)
    b, _ = generate_pairs(200, seed=7)
    assert a.equals(b)
    c, _ = generate_pairs(200, seed=8)
    assert not a.equals(c)


def test_lineage_partition_invariant(labeled):
    """Every input row is exactly one of kept / dropped / issue."""
    df, pairs = labeled
    kept = df["keep"]
    dropped = df["drop_reason"].notna()
    issue = ~df["decode_ok"]
    assert ((kept.astype(int) + dropped.astype(int) + issue.astype(int)) == 1).all()
    assert len(df) == len(pairs)
