"""langid + perplexity model contracts (pure python, no Spark)."""

import subprocess
import sys

import numpy as np
import pandas as pd

from gobulk_spark.models import langid, perplexity
from gobulk_spark.models.seed_corpus import LANGS, SEED_TEXT


def _seed_frame() -> pd.DataFrame:
    rows = [(lang, s) for lang in LANGS for s in SEED_TEXT[lang]]
    return pd.DataFrame(rows, columns=["lang", "text"])


def test_langid_separates_languages():
    df = _seed_frame()
    pred = langid.predict(df["text"])
    assert (pred["lang"].to_numpy() == df["lang"].to_numpy()).mean() >= 0.98
    assert pred["lang_conf"].min() > 0.6


def test_langid_null_and_garbage():
    pred = langid.predict(pd.Series([None, "", "   ", "zqx vrb plk wjt mnb ghf"]))
    assert list(pred["lang"][:3]) == ["und", "und", "und"]
    assert pred["lang_conf"].iloc[3] < 0.6  # garbage is low-confidence


def test_perplexity_orders_clean_below_garbage():
    clean = perplexity.score(_seed_frame()["text"])
    garbage = perplexity.score(pd.Series(["zqx vrb plk wjt mnb ghf dsa qwe"]))
    assert clean.max() < 100
    assert garbage.iloc[0] > 1000


def test_models_process_stable():
    """Scores must be identical in a fresh interpreter (PYTHONHASHSEED-proof)."""
    texts = ["a brown dog runs across the green field", "zqx vrb plk"]
    local_l = langid.predict(pd.Series(texts))
    local_p = perplexity.score(pd.Series(texts))
    code = (
        "import pandas as pd, json;"
        "from gobulk_spark.models import langid, perplexity;"
        f"t = pd.Series({texts!r});"
        "l = langid.predict(t); p = perplexity.score(t);"
        "print(json.dumps([l['lang'].tolist(), l['lang_conf'].tolist(), p.tolist()]))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
        env={"PYTHONHASHSEED": "12345", "PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo"},
    )
    import json

    lang, conf, ppl = json.loads(out.stdout)
    assert lang == local_l["lang"].tolist()
    np.testing.assert_allclose(conf, local_l["lang_conf"].to_numpy(), rtol=0, atol=0)
    np.testing.assert_allclose(ppl, local_p.to_numpy(), rtol=0, atol=0)


def test_vectorized_matches_singleton_calls():
    """Batched scoring == per-row scoring (no cross-row leakage)."""
    texts = _seed_frame()["text"].head(10)
    batch = perplexity.score(texts)
    singles = pd.concat([perplexity.score(texts[i : i + 1]) for i in range(len(texts))])
    np.testing.assert_allclose(batch.to_numpy(), singles.to_numpy(), rtol=1e-12)
