"""Arrow-vectorized pandas stages (the only Python in the hot path).

The parse stage is gobulk's Parser.ParseBulkElements + the user's
Format.Parse (parser.go:46-122, format.go:28-29) re-expressed as one
``mapInPandas`` pass: each Arrow batch of source rows comes in with the
image bytes, and leaves as a *narrow* typed feature frame — the binary
column dies inside this function and never reaches a shuffle (SURVEY §4:
"never shuffle decoded pixels").

Per-row failures (undecodable images) become issue markers in the output
rather than task failures — gobulk's FormatWithIssuesTracking error
policy (format.go:132-138, runner.go:311-332). With stop_on_error=True
the stage raises on the first issue instead (StopOnError).

Models (langid, perplexity) are module-level lazy singletons fit from an
embedded corpus at first use in each Python worker — the executor-side
equivalent of broadcasting small model artifacts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from .functions import textstats
from .functions.scrub import scrub_captions
from .models import langid, perplexity
from .reference_labeler import decode_batch

# Output schema of the parse stage (DDL string used by mapInPandas).
# content_hash rides through from the scan projection: the store phase
# audits it so the incremental marker can key on (image_id, content_hash)
# — gobulk's re-import contract (tracker/gorm.go:441-449).
PARSE_OUTPUT_SCHEMA = (
    "image_id string, source_file string, content_hash string, "
    "w int, h int, fmt string, phash long, "
    "scrubbed_caption string, decoded_w int, decoded_h int, pix_mean double, "
    "brightness double, pix_entropy double, edge_strength double, "
    "decode_ok boolean, issue_note string, lang string, lang_conf double, "
    "ppl double, max_word_freq_ratio double, stopword_density double"
)


def parse_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One Arrow batch: decode + scrub + model scores + token features."""
    scrubbed = scrub_captions(pdf["caption"])
    dec = decode_batch(pdf["bytes"])
    lid = langid.predict(scrubbed)
    out = pd.DataFrame(
        {
            "image_id": pdf["image_id"],
            "source_file": pdf["source_file"],
            "content_hash": pdf["content_hash"],
            # nullable extension dtypes: a NULL w/h/phash arrives as
            # float64 NaN and plain astype(int) raises
            # IntCastingNaNError, killing the task — nulls must instead
            # flow through Arrow to plan.py's fail-closed null handling
            "w": pdf["w"].astype("Int32"),
            "h": pdf["h"].astype("Int32"),
            "fmt": pdf["fmt"],
            "phash": pdf["phash"].astype("Int64"),
            "scrubbed_caption": scrubbed,
            "decoded_w": dec["decoded_w"].astype("int32"),
            "decoded_h": dec["decoded_h"].astype("int32"),
            "pix_mean": dec["pix_mean"],
            "brightness": dec["brightness"],
            "pix_entropy": dec["pix_entropy"],
            "edge_strength": dec["edge_strength"],
            "decode_ok": dec["decode_ok"],
            "issue_note": dec["issue_note"],
            "lang": lid["lang"],
            "lang_conf": lid["lang_conf"],
            "ppl": perplexity.score(scrubbed),
            "max_word_freq_ratio": textstats.max_word_freq_ratio(scrubbed),
        },
        index=pdf.index,
    )
    out["stopword_density"] = textstats.stopword_density(scrubbed, out["lang"])
    return out


def make_parse_stage(stop_on_error: bool = False):
    """Returns the mapInPandas iterator function for the parse phase."""

    def parse_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = parse_batch(pdf)
            if stop_on_error and not out["decode_ok"].all():
                bad = out.loc[~out["decode_ok"], "image_id"].iloc[0]
                raise ValueError(f"StopOnError: undecodable image {bad}")
            yield out

    return parse_stage
