"""Text-analysis operators over a documents table.

All are single-pass ``map_batches`` transforms; the language-ID stage is a
callable class (actor pool) because it holds compiled regexes and stopword
tables — built once per actor in ``__init__``, used per batch.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pyarrow as pa

__all__ = ["token_count", "quality_score", "LangId", "lang_id", "fingerprint"]

#: BPE-ish word splitter: letter runs, digit runs, single punctuation —
#: close to the GPT-2 pre-tokenizer's coarse classes, regex-only.
_BPEISH = re.compile(r"[A-Za-zÀ-ɏ]+|\d+|[^\sA-Za-zÀ-ɏ\d]")
_WS = re.compile(r"\s+")


def token_count(ds, col: str = "text"):
    """Adds ``ws_tokens`` (whitespace tokens — SQL-checkable) and
    ``bpe_tokens`` (regex pre-tokenizer count)."""
    import pandas as pd

    def _count(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[col].fillna("")
        stripped = text.str.strip()
        batch["ws_tokens"] = np.where(
            stripped == "", 0, stripped.str.split(_WS).str.len())
        batch["ws_tokens"] = batch["ws_tokens"].astype("int64")
        batch["bpe_tokens"] = text.map(lambda t: len(_BPEISH.findall(t))).astype("int64")
        return batch

    return ds.map_batches(_count, batch_format="pandas")


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
           "was", "on", "are", "with", "as", "this", "be", "at", "have"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "eine",
           "mit", "auf", "für", "den", "von", "zu", "im", "sich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "que",
           "qui", "dans", "pour", "pas", "sur", "avec", "au"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "que",
           "en", "no", "se", "por", "con", "para", "su"},
    "it": {"il", "la", "le", "e", "è", "un", "una", "di", "che", "non",
           "per", "con", "del", "si", "sono", "come"},
}


def quality_score(ds, col: str = "text"):
    """Deterministic quality heuristics: char/word counts, punctuation /
    digit / uppercase ratios, stopword ratio (en), mean word length, and a
    composite ``quality`` in [0,1] (C4/Gopher-style filters, regex-only)."""
    import pandas as pd

    word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
    punct_re = re.compile(r"[.!?]")
    en_stop = _STOPWORDS["en"]

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[col].fillna("")
        n_chars = text.str.len()
        words = text.map(lambda t: word_re.findall(t.lower()))
        n_words = words.str.len()
        mean_wlen = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        stop_ratio = words.map(
            lambda ws: sum(w in en_stop for w in ws) / len(ws) if ws else 0.0)
        n_sentences = text.map(lambda t: len(punct_re.findall(t)))
        digit_ratio = text.map(
            lambda t: sum(c.isdigit() for c in t) / len(t) if t else 0.0)
        upper_ratio = text.map(
            lambda t: sum(c.isupper() for c in t) / len(t) if t else 0.0)
        quality = (
            (n_words.clip(0, 200) / 200) * 0.3
            + ((mean_wlen >= 3) & (mean_wlen <= 10)).astype(float) * 0.3
            + stop_ratio.clip(0, 0.4) / 0.4 * 0.2
            + (1 - digit_ratio.clip(0, 0.5) * 2) * 0.1
            + (n_sentences.clip(0, 10) / 10) * 0.1) * (n_words > 0)
        batch["n_chars_calc"] = n_chars.astype("int64")
        batch["n_words"] = n_words.astype("int64")
        batch["n_sentences"] = n_sentences.astype("int64")
        batch["mean_word_len"] = mean_wlen
        batch["stopword_ratio"] = stop_ratio
        batch["digit_ratio"] = digit_ratio
        batch["upper_ratio"] = upper_ratio
        batch["quality"] = quality
        # integer-exact counterparts (for SQL-oracle comparison: float
        # ratios hit decimal-half rounding ties where numpy and SQL
        # engines legitimately disagree on the last digit)
        batch["n_stopwords"] = words.map(
            lambda ws: sum(w in en_stop for w in ws)).astype("int64")
        batch["sum_word_len"] = words.map(
            lambda ws: sum(len(w) for w in ws)).astype("int64")
        batch["n_digits"] = text.map(
            lambda t: sum(c.isdigit() for c in t)).astype("int64")
        return batch

    return ds.map_batches(_score, batch_format="pandas")


class LangId:
    """Stopword + character n-gram language heuristic as an actor-pool
    stage: tables and regexes compiled once per actor."""

    LANGS = tuple(_STOPWORDS)

    def __init__(self):
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        # distinctive character patterns as a weak tie-breaker
        self.char_hints = {
            "de": re.compile(r"[äöüß]"), "fr": re.compile(r"[àâçéèêëîïôûù]"),
            "es": re.compile(r"[áéíóúñ¿¡]"), "it": re.compile(r"[àèéìòù]"),
        }

    def classify(self, text: str) -> tuple[str, float]:
        words = self.word_re.findall(text.lower())
        if not words:
            return "und", 0.0
        scores = {lang: sum(w in tbl for w in words) / len(words)
                  for lang, tbl in self.tables.items()}
        for lang, pat in self.char_hints.items():
            if pat.search(text):
                scores[lang] += 0.05
        best = max(sorted(scores), key=lambda k: scores[k])
        return (best, scores[best]) if scores[best] > 0.02 else ("und", scores[best])

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, confs = [], []
        for t in batch["text"].to_pylist():
            lang, conf = self.classify(t or "")
            langs.append(lang)
            confs.append(conf)
        batch = batch.append_column("lang_pred", pa.array(langs, type=pa.string()))
        return batch.append_column("lang_conf", pa.array(confs, type=pa.float64()))


def lang_id(ds, concurrency: int = 4, batch_size: int = 2048):
    return ds.map_batches(LangId, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def fingerprint(ds, col: str = "text", id_col: str = "doc_id", window: int = 8):
    """Winnowing document fingerprint (Schleimer et al. 2003): rolling
    token 5-gram hashes → per-window minima → xor-fold to one 64-bit hex
    fingerprint.  Robust to small edits; deterministic."""

    def _fp_one(text: str) -> str:
        toks = [t.casefold() for t in _BPEISH.findall(text)]
        if not toks:
            return "0" * 16
        grams = [" ".join(toks[i:i + 5]) for i in range(max(1, len(toks) - 4))]
        hs = np.fromiter(
            (struct.unpack("<Q", hashlib.blake2b(g.encode(), digest_size=8).digest())[0]
             for g in grams), dtype=np.uint64, count=len(grams))
        if len(hs) <= window:
            sel = hs
        else:
            idx = np.arange(len(hs) - window + 1)
            sel = np.array([hs[i:i + window].min() for i in idx], dtype=np.uint64)
            sel = np.unique(sel)
        acc = np.uint64(0)
        for v in sel:
            acc ^= v
        return f"{int(acc):016x}"

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [_fp_one(t or "") for t in batch[col].to_pylist()]
        return batch.append_column("fingerprint", pa.array(fps, type=pa.string()))

    return ds.map_batches(_fp, batch_format="pyarrow")
