"""Text-analysis operators over a documents table.

All are single-pass ``map_batches`` transforms; the language-ID stage is a
callable class (actor pool) because it holds token tables and compiled
hint patterns — built once per actor in ``__init__``, used per batch.

Hot-path counters are Arrow compute kernels (``count_substring_regex``,
``split_pattern_regex`` + ``is_in`` + a bincount reduce) — no per-row
Python in the scoring loop; at corpus scale the quality filter IS the
pipeline, so a ``.map(lambda)`` here would dominate the whole run.

Tokenization is deliberately **ASCII** (``[a-z]+`` over lowercased text):
it makes the counters bit-identical to the RE2/DuckDB oracle expressions
(`regexp_extract_all(lower(text), '[a-z]+')`), the same explicit
RE2-parity choice ``ops.dedup.ngram_jaccard_allpairs`` documents.  Python
``re``'s Unicode ``[^\\W\\d_]`` / ``str.isdigit()`` count differently on
non-ASCII text and made oracle parity charset-fragile.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["token_count", "quality_score", "LangId", "lang_id", "fingerprint",
           "top_ngrams"]

#: BPE-ish word splitter: letter runs, digit runs, single punctuation —
#: close to the GPT-2 pre-tokenizer's coarse classes, regex-only.
#: (RE2-compatible: used both by Python re here and Arrow kernels.)
_BPEISH_PAT = r"[A-Za-zÀ-ɏ]+|[0-9]+|[^\sA-Za-zÀ-ɏ0-9]"
_BPEISH = re.compile(_BPEISH_PAT)


def _per_list_sum(lists: pa.Array, flags: np.ndarray, n: int) -> np.ndarray:
    """Sum ``flags`` (one per flattened list element) back to one value
    per list row — the vectorized 'count matching tokens per document'
    reduce shared by quality_score and LangId."""
    if len(flags) == 0:
        return np.zeros(n, dtype=np.int64)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    return np.bincount(parent, weights=flags, minlength=n).astype(np.int64)


def token_count(ds, col: str = "text"):
    """Adds ``ws_tokens`` (whitespace tokens — SQL-checkable) and
    ``bpe_tokens`` (regex pre-tokenizer count).  Pure Arrow kernels."""

    def _count(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch[col], "")
        ws = pc.count_substring_regex(t, pattern=r"\S+").cast(pa.int64())
        bpe = pc.count_substring_regex(t, pattern=_BPEISH_PAT).cast(pa.int64())
        batch = batch.append_column("ws_tokens", ws)
        return batch.append_column("bpe_tokens", bpe)

    return ds.map_batches(_count, batch_format="pyarrow")


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
    composite ``quality`` in [0,1] (C4/Gopher-style filters, regex-only).

    Every counter is an Arrow kernel over the batch (this is THE hot
    stage of a corpus-scale quality filter); the integer counters are
    bit-identical to the ASCII DuckDB oracle expressions."""
    stop_arr = pa.array(sorted(_STOPWORDS["en"]))

    def _score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        t = pc.fill_null(batch[col].combine_chunks(), "")
        lower = pc.utf8_lower(t)

        def count(arr, pat):
            return pc.count_substring_regex(arr, pattern=pat) \
                .to_numpy(zero_copy_only=False).astype(np.int64)

        n_chars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = count(lower, "[a-z]+")
        sum_wlen = count(lower, "[a-z]")
        n_digits = count(t, "[0-9]")
        n_upper = count(t, "[A-Z]")
        n_sentences = count(t, "[.!?]")

        # stopword hits: tokenize once (split on non-letters), set-member
        # test on the flattened tokens, bincount back per document
        lists = pc.split_pattern_regex(lower, pattern="[^a-z]+")
        member = pc.is_in(pc.list_flatten(lists), value_set=stop_arr) \
            .to_numpy(zero_copy_only=False)
        n_stop = _per_list_sum(lists, member, n)

        nw = np.maximum(n_words, 1)
        nc = np.maximum(n_chars, 1)
        mean_wlen = sum_wlen / nw
        stop_ratio = n_stop / nw
        digit_ratio = n_digits / nc
        upper_ratio = n_upper / nc
        quality = (
            (np.clip(n_words, 0, 200) / 200) * 0.3
            + ((mean_wlen >= 3) & (mean_wlen <= 10)).astype(float) * 0.3
            + np.clip(stop_ratio, 0, 0.4) / 0.4 * 0.2
            + (1 - np.clip(digit_ratio, 0, 0.5) * 2) * 0.1
            + (np.clip(n_sentences, 0, 10) / 10) * 0.1) * (n_words > 0)

        zero = n_words == 0
        empty = n_chars == 0
        for name, arr in [
                ("n_chars_calc", n_chars), ("n_words", n_words),
                ("n_sentences", n_sentences),
                ("mean_word_len", np.where(zero, 0.0, mean_wlen)),
                ("stopword_ratio", np.where(zero, 0.0, stop_ratio)),
                ("digit_ratio", np.where(empty, 0.0, digit_ratio)),
                ("upper_ratio", np.where(empty, 0.0, upper_ratio)),
                ("quality", quality),
                # integer-exact counterparts (for SQL-oracle comparison:
                # float ratios hit decimal-half rounding ties where numpy
                # and SQL engines legitimately disagree on the last digit)
                ("n_stopwords", n_stop), ("sum_word_len", sum_wlen),
                ("n_digits", n_digits)]:
            batch = batch.append_column(name, pa.array(arr))
        return batch

    return ds.map_batches(_score, batch_format="pyarrow")


class LangId:
    """Stopword + character-hint language heuristic as an actor-pool
    stage: token tables and hint patterns built once per actor; the
    per-batch path is one tokenize + one set-membership test per language
    (Arrow kernels + a bincount reduce), no per-row Python.

    Scoring: ``score(lang) = stopword_hits / n_words (+ 0.05 if a
    language-distinctive character occurs)``; highest score wins, ties
    break to the alphabetically-first language; below 0.02 (or no words)
    → ``und``.  Tokens are ASCII ``[a-z]+`` runs of the lowercased text
    (RE2/DuckDB-oracle parity — see module docstring), so non-ASCII
    stopwords ("für", "è") can only contribute via the character hints."""

    LANGS = tuple(sorted(_STOPWORDS))

    def __init__(self):
        self.tables = {lang: pa.array(sorted(ws))
                       for lang, ws in _STOPWORDS.items()}
        # distinctive character patterns as a weak tie-breaker
        self.char_hints = {
            "de": "[äöüß]", "fr": "[àâçéèêëîïôûù]",
            "es": "[áéíóúñ¿¡]", "it": "[àèéìòù]",
        }

    def _scores(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(n_words, score matrix [n_rows × len(LANGS)]) for a batch."""
        n = batch.num_rows
        t = pc.fill_null(batch["text"].combine_chunks(), "")
        lower = pc.utf8_lower(t)
        n_words = pc.count_substring_regex(lower, pattern="[a-z]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lists = pc.split_pattern_regex(lower, pattern="[^a-z]+")
        flat = pc.list_flatten(lists)
        nw = np.maximum(n_words, 1)
        scores = np.zeros((n, len(self.LANGS)), dtype=np.float64)
        for j, lang in enumerate(self.LANGS):
            member = pc.is_in(flat, value_set=self.tables[lang]) \
                .to_numpy(zero_copy_only=False)
            scores[:, j] = _per_list_sum(lists, member, n) / nw
            hint = self.char_hints.get(lang)
            if hint:
                hit = pc.greater(
                    pc.count_substring_regex(t, pattern=hint), 0) \
                    .to_numpy(zero_copy_only=False)
                scores[:, j] += 0.05 * hit
        return n_words, scores

    def classify(self, text: str) -> tuple[str, float]:
        n_words, scores = self._scores(pa.table({"text": [text]}))
        if n_words[0] == 0:
            return "und", 0.0
        j = int(np.argmax(scores[0]))  # first max → alphabetical tie-break
        best = float(scores[0, j])
        return (self.LANGS[j], best) if best > 0.02 else ("und", best)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_words, scores = self._scores(batch)
        j = scores.argmax(axis=1)  # first max → alphabetical tie-break
        best = scores[np.arange(len(j)), j]
        langs = np.where((n_words == 0) | (best <= 0.02), "und",
                         np.asarray(self.LANGS, dtype=object)[j])
        confs = np.where(n_words == 0, 0.0, best)
        batch = batch.append_column(
            "lang_pred", pa.array(langs, type=pa.string()))
        return batch.append_column("lang_conf", pa.array(confs, type=pa.float64()))


def lang_id(ds, concurrency: int = 4, batch_size: int = 2048):
    return ds.map_batches(LangId, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def fingerprint(ds, col: str = "text", id_col: str = "doc_id", window: int = 8,
                hash_family: str = "fast"):
    """Winnowing document fingerprint (Schleimer et al. 2003): rolling
    token 5-gram hashes → per-window minima → xor-fold to one 64-bit hex
    fingerprint.  Robust to small edits; deterministic (the gram hasher
    is a fixed-key vectorized SipHash by default — see
    ``ops.dedup._hash_str_array``; ``hash_family="blake2b"`` restores the
    audited per-gram path)."""
    from .dedup import _hash_str_array

    def _fp_one(text: str) -> str:
        toks = [t.casefold() for t in _BPEISH.findall(text)]
        if not toks:
            return "0" * 16
        grams = [" ".join(toks[i:i + 5]) for i in range(max(1, len(toks) - 4))]
        hs = _hash_str_array(grams, hash_family)
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


def top_ngrams(ds, n: int = 3, k: int = 20, col: str = "text"):
    """Corpus n-gram vocabulary: top-``k`` word n-grams by multiset count.

    Per-batch combiner: tokens come from ONE Arrow
    ``split_pattern_regex`` pass (same RE2-parity ASCII tokenizer as the
    Jaccard ops, ``[0-9a-z_]+``), n-grams are built vectorized — the
    flattened token array joined with itself shifted 1..n-1, masked to
    windows that stay inside one document (``list_parent_indices``) —
    and counted with one ``value_counts``.  The shuffle then moves one
    row per DISTINCT gram per batch (bounded by vocabulary, not corpus),
    a native grouped Sum totals them, and the top-k is a distributed
    sort + limit.  Ties at rank k break lexicographically (deterministic
    and SQL-reproducible)."""
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(b[col], ""))
        # split on non-token chars; empty strings mark the gaps
        toks = pc.split_pattern_regex(txt, r"[^0-9a-z_]+")
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        m = len(flat) - (n - 1)
        if m <= 0:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        # a window is valid iff its first and last token share a document
        valid = parent[:m] == parent[n - 1:]
        # binary_join_element_wise takes the separator LAST
        parts = [flat.slice(i, m) for i in range(n)] + [" "]
        grams = pc.binary_join_element_wise(*parts).filter(pa.array(valid))
        import pandas as pd

        counts = pd.Series(grams.to_pandas()).value_counts()
        return pa.table({"gram": pa.array(counts.index, type=pa.string()),
                         "n": pa.array(counts.to_numpy(), type=pa.int64())})

    out = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby("gram").aggregate(Sum("n", alias_name="n")))
    return out.sort(["n", "gram"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (distributed DF → broadcast IDF → local top-k)

def tfidf_top_terms(ds, col: str = "text", id_col: str = "doc_id",
                    top_k: int = 5, token_pattern: str = r"[0-9a-z_]+",
                    idf_mode: str = "broadcast", num_buckets: int = 64):
    """Top-``top_k`` TF-IDF terms per document: ``score = tf ·
    ln(N / df)`` rounded to 6 dp, tie-broken by term — deterministic
    under any row order, which is what makes the DuckDB window-function
    twin value-exact.

    Two bounded passes over the corpus:

    1. document frequency — a per-batch DISTINCT-terms combiner (one row
       per distinct term per batch leaves the batch, never one per
       token) → ONE ``groupby(term)`` Sum.  ``N`` (docs with ≥1 token)
       rides along as a reserved empty-string term — the token pattern
       requires ≥1 char, so "" can never collide with a real term.
    2. scoring — the idf table broadcasts once (``ray.put`` of an
       index-keyed Series: the classic small side, vocabulary-bounded),
       and each batch computes tf, maps idf with one vectorized
       ``reindex``, and keeps its own docs' top-k — NO shuffle in this
       pass, since a document's rows live inside one batch.

    ``idf_mode`` picks the pass-2 idf attachment (both EXACT —
    equivalence pytest-gated):

    - ``"broadcast"`` (default): the idf Series ships once via
      ``ray.put`` — right whenever the vocabulary fits one worker, and
      the shape the oracle query uses;
    - ``"bucketed"``: the vocabulary NEVER leaves the cluster — the df
      aggregate stays a Dataset, idf attaches through a term-hash
      bucketed join (one exchange, one vectorized pandas merge per
      bucket), and a second doc-hash exchange regroups each document's
      scored terms for the local top-k.  Three exchanges total, every
      one hash-partitioned — the 100-TB path for web-scale vocabularies
      whose hapax tail outgrows a broadcast.

    The ASCII token pattern matches RE2/DuckDB regex semantics so both
    engines tokenize identically."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    tok = re.compile(token_pattern)

    def _df_partial(b: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        n_docs = 0
        for text in b[col].to_pylist():
            terms = set(tok.findall((text or "").lower()))
            if terms:
                n_docs += 1
            counts.update(terms)
        items = list(counts.items()) + [("", n_docs)]
        return pa.table({
            "term": pa.array([t for t, _ in items], pa.string()),
            "df": pa.array([c for _, c in items], pa.int64())})

    df_agg = (ds.map_batches(_df_partial, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("df", alias_name="df")))
    if idf_mode == "bucketed":
        return _tfidf_bucketed(ds, df_agg, col, id_col, top_k, tok,
                               num_buckets)
    agg = df_agg.to_pandas()
    n_docs = int(agg.loc[agg["term"] == "", "df"].iloc[0])
    vocab = agg[agg["term"] != ""]
    idf = pd.Series(np.log(n_docs / vocab["df"].to_numpy(dtype=np.float64)),
                    index=vocab["term"].to_numpy())
    idf_ref = ray.put(idf)

    def _score(b: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "score": pa.array([], pa.float64())})
        idf_s = ray.get(idf_ref)
        docs, terms = [], []
        for did, text in zip(b[id_col].to_pylist(), b[col].to_pylist()):
            ts = tok.findall((text or "").lower())
            docs.extend([did] * len(ts))
            terms.extend(ts)
        if not docs:
            return empty
        df = pd.DataFrame({id_col: docs, "term": terms})
        tf = (df.groupby([id_col, "term"], sort=False).size()
              .reset_index(name="tf"))
        tf["score"] = np.round(
            tf["tf"].to_numpy(dtype=np.float64)
            * idf_s.reindex(tf["term"]).to_numpy(), 6)
        tf = tf.sort_values([id_col, "score", "term"],
                            ascending=[True, False, True])
        top = tf.groupby(id_col, sort=False).head(top_k)
        return pa.Table.from_pandas(top[[id_col, "term", "score"]],
                                    preserve_index=False)

    return ds.map_batches(_score, batch_format="pyarrow")


def _tfidf_bucketed(ds, df_agg, col: str, id_col: str, top_k: int,
                    tok, num_buckets: int):
    """The no-broadcast TF-IDF pass 2 (see ``tfidf_top_terms``): the
    vocabulary stays distributed.  ``df_agg`` materializes into the
    OBJECT STORE (spillable, vocabulary-sized — never the driver heap);
    only the scalar N reaches the driver.  Exchange 1 co-locates tf rows
    with their term's idf row by term hash (typed-null-unified schema,
    one vectorized merge per bucket — the `_attach_value` lesson);
    exchange 2 regroups by doc hash for the local top-k."""
    import pandas as pd

    from pandas.util import hash_array

    df_agg = df_agg.materialize()
    n_docs = int(df_agg.map_batches(
        lambda b: b.filter(pc.equal(b["term"], "")),
        batch_format="pyarrow").to_pandas()["df"].sum())

    def _term_bucket(terms) -> np.ndarray:
        h = hash_array(np.asarray(terms, dtype=object)).astype(np.uint64)
        return (h & np.uint64(num_buckets - 1)).astype(np.int32)

    def _unified(bucket, side, terms, ids=None, tf=None, idf=None):
        n = len(terms)
        return pa.table({
            "bucket": pa.array(bucket, pa.int32()),
            "side": pa.array([side] * n, pa.string()),
            "term": pa.array(terms, pa.string()),
            id_col: (pa.array(ids, pa.int64()) if ids is not None
                     else pa.nulls(n, pa.int64())),
            "tf": (pa.array(tf, pa.int64()) if tf is not None
                   else pa.nulls(n, pa.int64())),
            "idf": (pa.array(idf, pa.float64()) if idf is not None
                    else pa.nulls(n, pa.float64()))})

    def _idf_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.not_equal(b["term"], ""))
        terms = t["term"].to_pylist()
        idf = np.log(n_docs / t["df"].to_numpy(zero_copy_only=False)
                     .astype(np.float64)) if terms else np.array([])
        return _unified(_term_bucket(terms) if terms else [], "v",
                        terms, idf=idf)

    def _tf_rows(b: pa.Table) -> pa.Table:
        docs, terms = [], []
        for did, text in zip(b[id_col].to_pylist(), b[col].to_pylist()):
            ts = tok.findall((text or "").lower())
            docs.extend([did] * len(ts))
            terms.extend(ts)
        if not docs:
            return _unified([], "t", [])
        tf = (pd.DataFrame({id_col: docs, "term": terms})
              .groupby([id_col, "term"], sort=False).size()
              .reset_index(name="tf"))
        return _unified(_term_bucket(tf["term"].tolist()), "t",
                        tf["term"].tolist(), ids=tf[id_col].tolist(),
                        tf=tf["tf"].to_numpy())

    def _join(g: pd.DataFrame) -> pa.Table:
        v = g[g["side"] == "v"][["term", "idf"]]
        t = g[g["side"] == "t"][[id_col, "term", "tf"]]
        m = t.merge(v, on="term", how="inner")
        score = np.round(m["tf"].to_numpy(dtype=np.float64)
                         * m["idf"].to_numpy(), 6)
        dbucket = (m[id_col].to_numpy(dtype=np.int64)
                   & (num_buckets - 1)).astype(np.int32)
        return pa.table({
            "dbucket": pa.array(dbucket, pa.int32()),
            id_col: pa.array(m[id_col].to_numpy(), pa.int64()),
            "term": pa.array(m["term"].tolist(), pa.string()),
            "score": pa.array(score, pa.float64())})

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "score", "term"],
                          ascending=[True, False, True])
        return (g.groupby(id_col, sort=False).head(top_k)
                [[id_col, "term", "score"]])

    scored = (ds.map_batches(_tf_rows, batch_format="pyarrow")
              .union(df_agg.map_batches(_idf_rows, batch_format="pyarrow"))
              .groupby("bucket").map_groups(_join, batch_format="pandas"))
    return (scored.groupby("dbucket")
            .map_groups(_topk, batch_format="pandas"))
