"""Model stages (language ID, perplexity) — pure numpy/pandas, executor-safe."""

from . import langid, perplexity, seed_corpus  # noqa: F401
