"""Text-analysis stages for large-scale training-data pipelines: token
counting, quality scoring, language-ID heuristic, document fingerprinting.

All stages are vectorized (pyarrow.compute / numpy over flattened token
buffers) or actor classes compiling their regexes once per actor
(map_batches(Cls, concurrency=N) — state in __init__, work in __call__)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_str_u64

TOKEN_PATTERN = r"[A-Za-z0-9_]+"
# BPE-ish pre-tokenizer (GPT-2-style split classes, lookahead-free so RE2 /
# DuckDB count identically): space-prefixed letter runs, digit runs,
# punctuation runs
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"

# tiny per-language stopword lists for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}


class TokenCount:
    """Append n_tokens (regex token count) + n_chars. DuckDB twin:
    len(regexp_extract_all(text, '[A-Za-z0-9_]+'))."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(batch[self.text_col], pattern=TOKEN_PATTERN)
        bpe = pc.count_substring_regex(batch[self.text_col], pattern=BPE_PATTERN)
        n_chars = pc.utf8_length(batch[self.text_col])
        return batch.append_column("n_tokens", toks.cast(pa.int64())) \
                    .append_column("n_bpe_tokens", bpe.cast(pa.int64())) \
                    .append_column("n_chars_calc", n_chars.cast(pa.int64()))


STOPWORD_PATTERN = r"\b(?:the|a|an|and|or|of|to|in|is|it)\b"


class QualityScore:
    """Length / punctuation / whitespace / uppercase ratios + a combined
    quality score. Per-row float ops are single IEEE operations on identical
    inputs, so the DuckDB oracle reproduces them bit-for-bit."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch[self.text_col]
        n = pc.utf8_length(t).cast(pa.float64())
        n_safe = pc.max_element_wise(n, 1.0)
        punct = pc.count_substring_regex(t, pattern=r"[.,;:!?]").cast(pa.float64())
        spaces = pc.count_substring_regex(t, pattern=r" ").cast(pa.float64())
        upper = pc.count_substring_regex(t, pattern=r"[A-Z]").cast(pa.float64())
        batch = batch.append_column("punct_ratio", pc.divide(punct, n_safe))
        batch = batch.append_column("space_ratio", pc.divide(spaces, n_safe))
        batch = batch.append_column("upper_ratio", pc.divide(upper, n_safe))
        lower = pc.utf8_lower(t)
        stops = pc.count_substring_regex(
            lower, pattern=STOPWORD_PATTERN).cast(pa.float64())
        toks = pc.count_substring_regex(
            lower, pattern=r"[a-z0-9_]+").cast(pa.float64())
        batch = batch.append_column(
            "stopword_ratio", pc.divide(stops, pc.max_element_wise(toks, 1.0)))
        return batch


class LangId:
    """Stopword-vote language id over a fixed tiny lexicon (deterministic
    heuristic; a real model would load in __init__ the same way)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.token_re = re.compile(TOKEN_PATTERN)
        self.langs = sorted(_LANG_STOPWORDS)
        self.lexicon = {w: lang for lang in self.langs
                        for w in _LANG_STOPWORDS[lang]}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].str.lower().str.findall(self.token_re)
        lex = self.lexicon
        langs = self.langs

        def vote(words):
            counts = dict.fromkeys(langs, 0)
            for w in words:
                lang = lex.get(w)
                if lang:
                    counts[lang] += 1
            best = max(langs, key=lambda l: (counts[l], -langs.index(l)))
            return best if counts[best] > 0 else "unknown"

        batch["lang_pred"] = toks.map(vote)
        return batch


class Fingerprint:
    """64-bit content fingerprint of the text column (FNV-1a + splitmix
    finalize — functions/hashing.hash_str_u64), exposed as int64."""

    def __init__(self, text_col: str = "text", out_col: str = "fp"):
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = hash_str_u64(batch[self.text_col])
        return batch.append_column(self.out_col, pa.array(h.view(np.int64)))
