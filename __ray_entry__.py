"""Driver contract: flagship entry, per-operator queries, DuckDB oracles.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.

Every SQL-expressible operator has an ``oracle_sql`` twin with IDENTICAL
column names; floating-point aggregates are rounded the same way on both
sides.  Non-SQL operators (the CSVW KG pipeline itself, MinHash/SimHash
LSH, winnowing fingerprints, language-ID, LSH ANN) return deterministic
results and rely on the driver's rows-only check plus the repo's own
pytest oracles (golden fixtures + W3C suite via rdf isomorphism).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from collections.abc import Callable
from typing import Any

REPO = os.path.dirname(os.path.abspath(__file__))
FIXTURES = os.path.join(REPO, "fixtures")

# importable regardless of the driver's working directory
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _cfg():
    from csvweb_ray.raycfg import configure

    configure()


def _ensure_cols(df, cols: dict):
    """Canonicalize a pandas-returning query result: fixed column order
    AND pinned dtypes.  Zero-row grouped results lose their schema (Ray
    drops empty blocks) and merge/concat paths widen dtypes (int64 →
    float64 when NaNs appear, object vs string) — both make the driver's
    value-hash diverge on value-equal frames (the pivot_wide lesson), so
    every query declares its schema once and casts to it unconditionally."""
    import pandas as pd

    if len(df) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in cols.items()})
    out = df[list(cols)].copy()
    for c, t in cols.items():
        if str(out[c].dtype) != str(t):
            out[c] = out[c].astype(t)
    return out.reset_index(drop=True)


def _docs_corpus(sf_dir: str):
    """Render the driver's ``documents`` table into a synthetic code-repo
    corpus (CSV files + CSVW metadata) — the flagship pipeline's input
    shape (repo, path, commit, lang, content)."""
    import pyarrow.parquet as pq

    from csvweb_ray.corpus import fixture_corpus_rows, rows_to_table, table_corpus_rows

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    rows = table_corpus_rows(docs, "docs", rows_per_file=100)
    rows += fixture_corpus_rows(FIXTURES)
    return rows_to_table(rows)


def entry() -> Any:
    """Flagship: sf0.001 documents + reference golden fixtures → corpus →
    scan → pair → convert → dedup → sort → N-Triples parquet; returns the
    final triples Dataset."""
    _cfg()
    import ray.data as rd

    from csvweb_ray.pipeline.runner import run_kg_pipeline

    corpus = _docs_corpus("/root/testdata/sf0.001")
    out = os.path.join(tempfile.gettempdir(), "csvweb_ray_entry")
    shutil.rmtree(out, ignore_errors=True)
    report = run_kg_pipeline(corpus, out, num_shards=8, with_linking=True)
    return rd.read_parquet(report["final_dir"])


# ---------------------------------------------------------------------------
# queries

def _q_kg_golden(sf_dir: str):
    """CSVW KG pipeline over the reference golden corpus (scale-free);
    correctness is separately gated by graph-isomorphism pytest."""
    _cfg()
    import ray.data as rd

    from csvweb_ray.corpus import fixture_corpus_rows, rows_to_table
    from csvweb_ray.pipeline.runner import run_kg_pipeline

    out = os.path.join(tempfile.gettempdir(), "csvweb_ray_q_golden")
    shutil.rmtree(out, ignore_errors=True)
    report = run_kg_pipeline(rows_to_table(fixture_corpus_rows(FIXTURES)),
                             out, num_shards=4)
    return rd.read_parquet(report["final_dir"]).sort("nt") \
        .select_columns(["subj", "pred", "obj_value", "nt"])


def _q_kg_docs(sf_dir: str):
    """CSVW KG pipeline over a corpus rendered from the documents table at
    sf scale — the scale-bearing flagship run."""
    _cfg()
    import ray.data as rd

    from csvweb_ray.pipeline.runner import run_kg_pipeline

    out = os.path.join(tempfile.gettempdir(), "csvweb_ray_q_docs")
    shutil.rmtree(out, ignore_errors=True)
    report = run_kg_pipeline(_docs_corpus(sf_dir), out, num_shards=8)
    ds = rd.read_parquet(report["final_dir"])

    def _count(b):
        import pyarrow as pa

        return pa.table({"pred": b["pred"]})

    from ray.data.aggregate import Count

    out_ds = (ds.map_batches(_count, batch_format="pyarrow")
              .groupby("pred").aggregate(Count(alias_name="n_triples")))
    return _ensure_cols(out_ds.to_pandas().sort_values("pred"),
                        {"pred": "object", "n_triples": "int64"})


def _q_kg_triples(sf_dir: str):
    """Flagship CSVW conversion, DuckDB-oracle-checked end to end: the
    documents table rendered as a CSV+CSVW-metadata corpus (simple typed
    schema, ``aboutUrl`` template — `table_corpus_rows`), converted through
    the FULL distributed pipeline (scan → pair → convert → dedup → sort),
    and the emitted (subj, pred, obj_value, obj_datatype) compared against
    a pure-SQL reconstruction of the CSVW conversion algorithm's output
    (URI-template subject minting, `url#name` default property IRIs,
    canonical xsd:integer lexical forms, string cells as plain literals).

    Documents are sorted by doc_id before corpus rendering so the file
    sharding (100 rows/file, repo = shard % 4) is reproducible in SQL via
    row_number() OVER (ORDER BY doc_id)."""
    _cfg()
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from csvweb_ray.corpus import rows_to_table, table_corpus_rows
    from csvweb_ray.pipeline.runner import run_kg_pipeline

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")) \
        .sort_by("doc_id")
    out = os.path.join(tempfile.gettempdir(), "csvweb_ray_q_kg_triples")
    shutil.rmtree(out, ignore_errors=True)
    report = run_kg_pipeline(
        rows_to_table(table_corpus_rows(docs, "docs", rows_per_file=100)),
        out, num_shards=8)

    def _clean(b: pa.Table) -> pa.Table:
        return pa.table({
            "subj": pc.cast(b["subj"], pa.string()),
            "pred": pc.cast(b["pred"], pa.string()),
            "obj_value": pc.cast(b["obj_value"], pa.string()),
            "obj_datatype": pc.fill_null(
                pc.cast(b["obj_datatype"], pa.string()), ""),
        })

    return (rd.read_parquet(
                report["final_dir"],
                columns=["subj", "pred", "obj_value", "obj_datatype"])
            .map_batches(_clean, batch_format="pyarrow")
            .sort(["subj", "pred", "obj_value"]))


def _q_doc_sha256(sf_dir: str):
    """G2 invariant: per-row content sha256 (DuckDB sha256 oracle)."""
    _cfg()
    import hashlib

    import pyarrow as pa

    from csvweb_ray.queries import T

    def _sha(b: pa.Table) -> pa.Table:
        vals = [hashlib.sha256((t or "").encode()).hexdigest()
                for t in b["text"].to_pylist()]
        return pa.table({"doc_id": b["doc_id"],
                         "content_sha256": pa.array(vals, type=pa.string())})

    return (T(sf_dir, "documents", columns=["doc_id", "text"])
            .map_batches(_sha, batch_format="pyarrow").sort("doc_id"))


def _q_exact_dedup(sf_dir: str):
    _cfg()
    from ray.data.aggregate import Count, Min

    from csvweb_ray.ops.dedup import add_sha256_column
    from csvweb_ray.queries import T

    ds = add_sha256_column(T(sf_dir, "documents", columns=["doc_id", "text"]))
    out = (ds.groupby("text_sha256")
           .aggregate(Min("doc_id", alias_name="keep_id"),
                      Count(alias_name="n_dups")))
    return _ensure_cols(out.to_pandas().sort_values("keep_id"),
                        {"keep_id": "int64", "n_dups": "int64"})


def _q_token_count(sf_dir: str):
    _cfg()
    from ray.data.aggregate import Count, Sum

    from csvweb_ray.ops.text import token_count
    from csvweb_ray.queries import T

    ds = token_count(T(sf_dir, "documents", columns=["doc_id", "lang", "text"]))
    out = (ds.groupby("lang")
           .aggregate(Sum("ws_tokens", alias_name="total_ws_tokens"),
                      Count(alias_name="n_docs")))
    return _ensure_cols(out.to_pandas().sort_values("lang"),
                        {"lang": "object", "total_ws_tokens": "int64",
                         "n_docs": "int64"})


def _q_text_stats(sf_dir: str):
    _cfg()
    from csvweb_ray.ops.text import quality_score
    from csvweb_ray.queries import T

    ds = quality_score(T(sf_dir, "documents", columns=["doc_id", "text"]))
    df = (ds.select_columns(["doc_id", "n_chars_calc", "n_sentences"])
          .sort("doc_id").to_pandas())
    return _ensure_cols(df, {"doc_id": "int64", "n_chars_calc": "int64",
                             "n_sentences": "int64"})


def _q_quality(sf_dir: str):
    """Quality-scoring surface, oracle-checked via integer-exact permille
    ratios (float ratios hit decimal-half rounding ties where numpy and
    DuckDB legitimately disagree on the last digit; integer division is
    bit-exact on both engines).  The float composite ``quality`` remains
    available from the op but is heuristic by construction."""
    _cfg()
    import pandas as pd

    from csvweb_ray.ops.text import quality_score
    from csvweb_ray.queries import T

    ds = quality_score(T(sf_dir, "documents", columns=["doc_id", "text"]))
    df = (ds.select_columns(["doc_id", "n_words", "n_sentences",
                             "n_stopwords", "sum_word_len", "n_digits",
                             "n_chars_calc"])
          .sort("doc_id").to_pandas())
    nw = df["n_words"].where(df["n_words"] > 0, 1)
    nc = df["n_chars_calc"].where(df["n_chars_calc"] > 0, 1)
    df["stopword_permille"] = (df["n_stopwords"] * 1000 // nw).astype("int64")
    df["mean_wlen_centi"] = (df["sum_word_len"] * 100 // nw).astype("int64")
    df["digit_permille"] = (df["n_digits"] * 1000 // nc).astype("int64")
    return _ensure_cols(df, {"doc_id": "int64", "n_words": "int64",
                             "n_sentences": "int64",
                             "stopword_permille": "int64",
                             "mean_wlen_centi": "int64",
                             "digit_permille": "int64"})


def _q_lang_id(sf_dir: str):
    _cfg()
    from ray.data.aggregate import Count

    from csvweb_ray.ops.text import lang_id
    from csvweb_ray.queries import T

    ds = lang_id(T(sf_dir, "documents", columns=["doc_id", "text"]), concurrency=2)
    out = ds.groupby("lang_pred").aggregate(Count(alias_name="n_docs"))
    return _ensure_cols(out.to_pandas().sort_values("lang_pred"),
                        {"lang_pred": "object", "n_docs": "int64"})


def _q_approx_quantiles(sf_dir: str):
    """Histogram-sketch quantiles (the 100-TB substitute for exact
    per-group materialization; error ≤ range/bins, pytest-gated vs numpy
    — no SQL oracle because the interpolated estimate is approximate by
    design)."""
    _cfg()
    import pandas as pd

    from csvweb_ray.ops.sketch import approx_quantiles
    from csvweb_ray.queries import T

    got = approx_quantiles(T(sf_dir, "lineitem", columns=["l_extendedprice"]),
                           "l_extendedprice", qs=(0.5, 0.95), bins=8192)
    return _ensure_cols(
        pd.DataFrame({"q": sorted(got),
                      "value": [round(got[q], 4) for q in sorted(got)]}),
        {"q": "float64", "value": "float64"})


def _q_quantiles_sketch(sf_dir: str):
    """Per-group histogram-sketch quantiles — the scale path twin of the
    exact `quantiles` query (error ≤ group-range/bins, pytest-gated; no
    SQL oracle because the estimate is approximate by design)."""
    _cfg()
    from csvweb_ray.ops.sketch import approx_quantiles_by
    from csvweb_ray.queries import T

    df = approx_quantiles_by(
        T(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"]),
        "l_returnflag", "l_extendedprice", qs=(0.5, 0.95), bins=8192)
    df["value"] = df["value"].round(4)
    return _ensure_cols(df, {"l_returnflag": "object", "q": "float64",
                             "value": "float64"})


def _q_distinct_count_hll(sf_dir: str):
    """HyperLogLog distinct users (~1.6% std error at p=12; pytest-gated
    accuracy — rows-only driver check)."""
    _cfg()
    import pandas as pd

    from csvweb_ray.ops.sketch import hll_distinct
    from csvweb_ray.queries import T

    est = hll_distinct(T(sf_dir, "events", columns=["user_id"]),
                       "user_id", p=12)
    return _ensure_cols(pd.DataFrame({"n_distinct_est": [int(round(est))]}),
                        {"n_distinct_est": "int64"})


def _q_distinct_count_hll_by(sf_dir: str):
    """Per-group HyperLogLog distinct users per event type — the grouped
    sketch twin of the exact `distinct_count` query (group-count-bounded
    combiner, shard-merged registers; ~1.6% std error at p=12,
    pytest-gated accuracy — rows-only driver check)."""
    _cfg()
    import pandas as pd

    from csvweb_ray.ops.sketch import hll_distinct_by
    from csvweb_ray.queries import T

    out = hll_distinct_by(
        T(sf_dir, "events", columns=["event_type", "user_id"]),
        "event_type", "user_id", p=12).to_pandas()
    out["n_distinct_est"] = out["n_distinct_est"].round().astype("int64")
    return _ensure_cols(out.sort_values("event_type"),
                        {"event_type": "object", "n_distinct_est": "int64"})


def _q_stratified_sample(sf_dir: str):
    """Deterministic content-hash stratified sampling (md5 permille —
    bit-exact DuckDB twin): 20% of English docs, 50% of every other
    stratum.  Same decision at any parallelism / on any resume."""
    _cfg()
    from csvweb_ray.ops.sampling import hash_sample
    from csvweb_ray.queries import T

    ds = hash_sample(T(sf_dir, "documents", columns=["doc_id", "lang"]),
                     "doc_id", rate_permille=500, salt="s0",
                     group_col="lang", group_rates={"en": 200})
    return ds.select_columns(["doc_id", "lang"]).sort("doc_id")


def _q_top_ngrams(sf_dir: str):
    """Corpus trigram vocabulary top-20 (deterministic lexicographic
    tie-break; DuckDB unnest/generate_series twin)."""
    _cfg()
    from csvweb_ray.ops.text import top_ngrams
    from csvweb_ray.queries import T

    out = top_ngrams(T(sf_dir, "documents", columns=["doc_id", "text"]),
                     n=3, k=20)
    df = out.to_pandas().sort_values(["n", "gram"], ascending=[False, True])
    return _ensure_cols(df, {"gram": "object", "n": "int64"})


def _q_fingerprint(sf_dir: str):
    _cfg()
    from csvweb_ray.ops.text import fingerprint
    from csvweb_ray.queries import T

    ds = fingerprint(T(sf_dir, "documents", columns=["doc_id", "text"]))
    return _ensure_cols(
        ds.select_columns(["doc_id", "fingerprint"]).sort("doc_id").to_pandas(),
        {"doc_id": "int64", "fingerprint": "object"})


def _q_minhash_pairs(sf_dir: str):
    _cfg()
    from csvweb_ray.ops.dedup import lsh_candidate_pairs, minhash_signatures
    from csvweb_ray.queries import T

    sigs = minhash_signatures(
        T(sf_dir, "documents", columns=["doc_id", "text"]), num_perm=64)
    pairs = lsh_candidate_pairs(sigs, num_bands=16, threshold=0.5)
    df = _ensure_cols(pairs.to_pandas(),
                      {"a": "int64", "b": "int64", "est_jaccard": "float64"})
    return df.sort_values(["a", "b"]).reset_index(drop=True).round(4)


def _q_simhash_pairs(sf_dir: str):
    _cfg()
    from csvweb_ray.ops.dedup import simhash_candidate_pairs, simhash_signatures
    from csvweb_ray.queries import T

    sigs = simhash_signatures(T(sf_dir, "documents", columns=["doc_id", "text"]))
    pairs = simhash_candidate_pairs(sigs, max_hamming=3)
    df = _ensure_cols(pairs.to_pandas(),
                      {"a": "int64", "b": "int64", "hamming": "int64"})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def _q_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard verification of MinHash candidates."""
    _cfg()
    from csvweb_ray.ops.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        verify_jaccard_pairs,
    )
    from csvweb_ray.queries import T

    docs = T(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = minhash_signatures(docs, num_perm=64)
    cands = lsh_candidate_pairs(sigs, num_bands=16, threshold=0.4)
    verified = verify_jaccard_pairs(docs, cands, threshold=0.5)
    df = _ensure_cols(verified.to_pandas(),
                      {"a": "int64", "b": "int64", "jaccard": "float64"})
    return df.sort_values(["a", "b"]).reset_index(drop=True).round(4)


def _q_ngram_jaccard_exact(sf_dir: str):
    """Exact all-pairs n-gram Jaccard — fully DuckDB-verifiable (the LSH
    variant has recall < 1 by design).  Runs over the FULL documents
    table: the corpus genuinely contains near-duplicate pairs (25 at
    sf0.01), so the oracle compares nonzero rows — the old every-5th
    subset happened to exclude them all, which made the green vacuous.
    Bounded-subset contract holds: documents is 500 rows at every test
    scale."""
    _cfg()
    from csvweb_ray.ops.dedup import ngram_jaccard_allpairs
    from csvweb_ray.queries import T

    docs = T(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_allpairs(docs, threshold=0.5)
    df = _ensure_cols(pairs.to_pandas(),
                      {"a": "int64", "b": "int64", "jaccard": "float64"})
    df["jaccard"] = df["jaccard"].round(4)
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def _subset_and_plant(b):
    """Every-5th vec_id subset + planted exact duplicates (every 50th
    vector re-emitted under ``vec_id + 100000``): the synthetic embeddings
    are near-orthogonal, so WITHOUT planting any near-dup query returns 0
    rows and a broken implementation would 'pass' vacuously.  Identical
    vectors have cosine exactly 1.0 and identical LSH signatures, so both
    the exact and the bucketed path must surface them."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    ids = np.asarray(b["vec_id"].to_pylist())
    base = b.filter(pa.array(ids % 5 == 0))
    plant = b.filter(pa.array(ids % 50 == 0))
    plant = plant.set_column(
        plant.schema.get_field_index("vec_id"), "vec_id",
        pc.add(plant["vec_id"], pa.scalar(100000, type=plant["vec_id"].type)))
    return pa.concat_tables([base, plant])


def _q_embedding_neardup(sf_dir: str):
    """Brute-force-equivalent near-dup (num_planes=0 → exact) with DuckDB
    list_cosine_similarity oracle; restricted to vec_id % 5 == 0 to bound
    the oracle's O(n²).

    The synthetic embeddings are near-orthogonal (max pairwise cosine
    ≈ 0.46), so the raw table yields ZERO pairs at any sane threshold —
    a broken implementation returning nothing would also 'pass'.  Both
    sides therefore PLANT deterministic duplicates: every 50th vector is
    re-emitted under ``vec_id + 100000`` with an identical embedding,
    guaranteeing ten exact-cosine-1.0 pairs the comparison must find."""
    _cfg()
    from csvweb_ray.ops.dedup import embedding_neardup_pairs
    from csvweb_ray.queries import T

    emb = T(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        _subset_and_plant, batch_format="pyarrow")
    pairs = embedding_neardup_pairs(emb, threshold=0.9, num_planes=0)
    df = _ensure_cols(pairs.to_pandas(),
                      {"a": "int64", "b": "int64", "cosine": "float64"})
    df = df.sort_values(["a", "b"])
    df["cosine"] = df["cosine"].round(4)
    return df.reset_index(drop=True)


def _q_embedding_neardup_lsh(sf_dir: str):
    """LSH-bucketed near-dup (the scale path; recall < 1 by design).

    Same planted-duplicate input as the exact variant — identical vectors
    share every hyperplane signature, so the planted pairs are found with
    probability 1 and the row count is provably nonzero (no vacuous
    pass); near-threshold non-identical pairs may still be missed, which
    is the documented recall trade."""
    _cfg()
    from csvweb_ray.ops.dedup import embedding_neardup_pairs
    from csvweb_ray.queries import T

    emb = T(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        _subset_and_plant, batch_format="pyarrow")
    pairs = embedding_neardup_pairs(emb, threshold=0.9, num_planes=8)
    df = _ensure_cols(pairs.to_pandas(),
                      {"a": "int64", "b": "int64", "cosine": "float64"})
    df = df.sort_values(["a", "b"])
    df["cosine"] = df["cosine"].round(4)
    return df.reset_index(drop=True)


def _q_ann_topk(sf_dir: str):
    """Exact cosine top-10 for the first 4 vectors as queries."""
    _cfg()
    from csvweb_ray.ops.similarity import ann_topk
    from csvweb_ray.queries import T

    out = ann_topk(T(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                   _queries_matrix(sf_dir), k=10)
    df = out.to_pandas()[["query_id", "vec_id", "score"]]
    df["score"] = df["score"].round(3)
    return df.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)


def _q_ann_topk_lsh(sf_dir: str):
    _cfg()
    from csvweb_ray.ops.similarity import ann_topk_lsh
    from csvweb_ray.queries import T

    out = ann_topk_lsh(T(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                       _queries_matrix(sf_dir), k=10, num_planes=6)
    df = out.to_pandas()[["query_id", "vec_id", "score"]]
    df["score"] = df["score"].round(3)
    return df.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)


def _queries_matrix(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    emb_file = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                             columns=["vec_id", "embedding"])
    first = emb_file.slice(0, 4).to_pylist()
    return np.asarray([r["embedding"]
                       for r in sorted(first, key=lambda r: r["vec_id"])])


def _q_ann_topk_ivf_full(sf_dir: str):
    """IVF with nprobe == num_centroids: exercises the full index-build +
    assign + probe machinery yet degenerates to exact brute force, so it
    shares ``ann_topk``'s DuckDB oracle (same output, value-exact)."""
    _cfg()
    from csvweb_ray.ops.similarity import ann_topk_ivf
    from csvweb_ray.queries import T

    out = ann_topk_ivf(T(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                       _queries_matrix(sf_dir), k=10,
                       num_centroids=8, nprobe=8)
    df = out.to_pandas()[["query_id", "vec_id", "score"]]
    df["score"] = df["score"].round(3)
    return df.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)


def _q_ann_topk_ivf(sf_dir: str):
    """IVF scale path (nprobe < num_centroids; recall < 1 by design —
    rows-only check here, recall gated by pytest)."""
    _cfg()
    from csvweb_ray.ops.similarity import ann_topk_ivf
    from csvweb_ray.queries import T

    out = ann_topk_ivf(T(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                       _queries_matrix(sf_dir), k=10,
                       num_centroids=8, nprobe=3)
    df = out.to_pandas()[["query_id", "vec_id", "score"]]
    df["score"] = df["score"].round(3)
    return df.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)


def _q_multimodal_stub(sf_dir: str):
    """Multimodal image path driven end-to-end with REAL PNG payloads:
    each document's text hash seeds a deterministic 8×8 RGB image,
    encoded as a valid PNG (mixed per-scanline filters) and decoded back
    through the distributed actor-pool stage by the pure-stdlib codec
    (``csvweb_ray.ops.png``) — rows-only driver check; the pixel-exact
    round-trip oracle is ``tests/test_png.py``."""
    _cfg()
    import hashlib as _hashlib

    import numpy as _np
    import pyarrow as pa

    from csvweb_ray.ops.multimodal import decode_images
    from csvweb_ray.ops.png import encode_png
    from csvweb_ray.queries import T

    def _to_media(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b["text"].to_pylist()
        payloads = []
        for t in texts:
            seed = int.from_bytes(
                _hashlib.sha256((t or "").encode()).digest()[:4], "little")
            px = _np.random.RandomState(seed).randint(
                0, 256, size=(8, 8, 3), dtype=_np.uint8)
            payloads.append(encode_png(px, filter_type="mixed"))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(["image"] * len(ids), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/png"] * len(ids), type=pa.string()),
            "meta": pa.array(["{}"] * len(ids), type=pa.string()),
        })

    media = (T(sf_dir, "documents", columns=["doc_id", "text"])
             .map_batches(_to_media, batch_format="pyarrow"))
    decoded = decode_images(media, height=8, width=8, concurrency=(1, 4))

    def _checksum(b: pa.Table) -> pa.Table:
        sums = [int(sum(px)) for px in b["pixels"].to_pylist()]
        return pa.table({"media_id": b["media_id"],
                         "pixel_sum": pa.array(sums, type=pa.int64())})

    return (decoded.map_batches(_checksum, batch_format="pyarrow")
            .sort("media_id").to_pandas())


def _q_audio_features(sf_dir: str):
    """Multimodal audio path driven end-to-end with REAL WAV payloads —
    and a real SQL oracle: each document gets a 0.25 s 16-bit PCM sine
    tone planted mid-band at ``doc_id % 14 + 1`` (of 16 rfft filter
    bands), the distributed actor-pool stage decodes and featurizes it
    through the pure-stdlib codec (``csvweb_ray.ops.wav``), and the
    engine reports the argmax band — which must equal the planted band
    the oracle computes from ``doc_id`` alone.  The hash match therefore
    certifies the full decode → FFT → filter-bank path, not just row
    plumbing."""
    _cfg()
    import numpy as _np
    import pyarrow as pa

    from csvweb_ray.ops.multimodal import extract_audio_features
    from csvweb_ray.ops.wav import encode_wav
    from csvweb_ray.queries import T

    rate, n = 8000, 2000                       # 0.25 s @ 8 kHz
    t = _np.arange(n) / rate

    def _to_media(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        payloads = []
        for did in ids:
            band = int(did) % 14 + 1
            freq = 250.0 * band + 125.0        # mid-band of 250-Hz bands
            payloads.append(encode_wav(
                0.5 * _np.sin(2 * _np.pi * freq * t), rate, sampwidth=2))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(["audio"] * len(ids), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["audio/wav"] * len(ids), type=pa.string()),
            "meta": pa.array(["{}"] * len(ids), type=pa.string()),
        })

    media = (T(sf_dir, "documents", columns=["doc_id"])
             .map_batches(_to_media, batch_format="pyarrow"))
    feats = extract_audio_features(media, n_bands=16, concurrency=(1, 4))

    def _peak(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "peak_band": pa.array([], type=pa.int64())})
        m = _np.asarray(b["features"].to_pylist(), dtype=_np.float64)
        return pa.table({
            "doc_id": b["media_id"],
            "peak_band": pa.array(m.argmax(axis=1).astype("int64")),
        })

    return (feats.map_batches(_peak, batch_format="pyarrow")
            .sort("doc_id").to_pandas())


def _q_video_frames(sf_dir: str):
    """Multimodal video path driven end-to-end with REAL Y4M payloads and
    a real SQL oracle: each document gets a YUV4MPEG2 clip of
    ``doc_id % 7 + 1`` solid frames with luma ``(doc_id*31 + f*17) % 256``
    and neutral chroma, the distributed actor-pool stage extracts every
    frame through the pure-stdlib codec (``csvweb_ray.ops.y4m``), and the
    engine reports each frame's gray level — which must equal the planted
    value the oracle computes from (doc_id, frame_no) alone.  The hash
    match certifies header/FRAME parsing, plane layout, BT.601 RGB and
    the resize, not just row plumbing."""
    _cfg()
    import numpy as _np
    import pyarrow as pa

    from csvweb_ray.ops.multimodal import sample_video_frames
    from csvweb_ray.ops.y4m import encode_y4m
    from csvweb_ray.queries import T

    def _to_media(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        payloads = []
        for did in ids:
            n = int(did) % 7 + 1
            frames = [(_np.full((16, 16), (int(did) * 31 + f * 17) % 256,
                                _np.uint8),
                       _np.full((8, 8), 128, _np.uint8),
                       _np.full((8, 8), 128, _np.uint8))
                      for f in range(n)]
            payloads.append(encode_y4m(frames))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(["video"] * len(ids), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["video/x-yuv4mpeg"] * len(ids),
                             type=pa.string()),
            "meta": pa.array(["{}"] * len(ids), type=pa.string()),
        })

    media = (T(sf_dir, "documents", columns=["doc_id"])
             .map_batches(_to_media, batch_format="pyarrow"))
    frames = sample_video_frames(media, every_nth=1, concurrency=(1, 4))

    def _gray(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "frame_no": pa.array([], type=pa.int32()),
                             "gray": pa.array([], type=pa.int64())})
        m = _np.asarray(b["pixels"].to_pylist(), dtype=_np.uint8)
        # solid frame ⇒ min == max; assert so a decode bug can't hide
        # behind a lucky mean
        if not (m.min(axis=1) == m.max(axis=1)).all():
            raise AssertionError("non-solid decoded frame")
        return pa.table({
            "doc_id": b["media_id"],
            "frame_no": b["frame_no"],
            "gray": pa.array(m[:, 0].astype("int64")),
        })

    return (frames.map_batches(_gray, batch_format="pyarrow")
            .sort(["doc_id", "frame_no"]).to_pandas())


def _q_image_decode(sf_dir: str):
    """Multimodal image path driven end-to-end with REAL baseline JPEG
    payloads and a real SQL oracle: each document gets a solid
    quality-100 JPEG at gray level ``(doc_id * 37) % 256`` — grayscale or
    RGB, 4:4:4 / 4:2:2 / 4:2:0, with and without restart markers, varied
    per doc — and the distributed ``ImageDecoder`` actor pool decodes it
    through the pure-stdlib codec (``csvweb_ray.ops.jpeg``).  At q=100
    the quantization tables are all ones and a solid image is DC-only,
    so the decode is EXACT: the hash match certifies huffman decode,
    dequantization, IDCT, chroma upsampling and the YCbCr→RGB math, not
    just row plumbing."""
    _cfg()
    import numpy as _np
    import pyarrow as pa

    from csvweb_ray.ops.jpeg import encode_jpeg
    from csvweb_ray.ops.multimodal import decode_images
    from csvweb_ray.queries import T

    subs = ["444", "422", "420"]

    def _to_media(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        payloads = []
        for did in ids:
            did = int(did)
            lv = (did * 37) % 256
            img = _np.full((16, 16), lv, _np.uint8) if did % 2 \
                else _np.full((16, 16, 3), lv, _np.uint8)
            payloads.append(encode_jpeg(img, quality=100,
                                        subsampling=subs[did % 3],
                                        restart_interval=did % 3))
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(["image"] * len(ids), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["image/jpeg"] * len(ids), type=pa.string()),
            "meta": pa.array(["{}"] * len(ids), type=pa.string()),
        })

    media = (T(sf_dir, "documents", columns=["doc_id"])
             .map_batches(_to_media, batch_format="pyarrow"))
    pixels = decode_images(media, height=8, width=8, concurrency=(1, 4))

    def _gray(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "gray": pa.array([], type=pa.int64())})
        m = _np.asarray(b["pixels"].to_pylist(), dtype=_np.uint8)
        # solid image ⇒ every decoded pixel equals the planted level;
        # assert so a decode bug can't hide behind a lucky first pixel
        if not (m.min(axis=1) == m.max(axis=1)).all():
            raise AssertionError("non-solid decoded image")
        return pa.table({
            "doc_id": b["media_id"],
            "gray": pa.array(m[:, 0].astype("int64")),
        })

    return (pixels.map_batches(_gray, batch_format="pyarrow")
            .sort("doc_id").to_pandas())


def queries() -> dict[str, Callable[[str], Any]]:
    from csvweb_ray import queries as Q

    def wrap(fn):
        def run(sf_dir: str):
            _cfg()
            return fn(sf_dir)
        return run

    return {
        # relational / dataflow operators (SURVEY §2.7 analogues)
        "filter_scan": wrap(Q.q_filter_scan),
        "groupby_agg": wrap(Q.q_groupby_agg),
        "broadcast_join": wrap(Q.q_broadcast_join),
        "hash_join": wrap(Q.q_hash_join),
        "dedup_first": wrap(Q.q_dedup_first),
        "sort_topk": wrap(Q.q_sort_topk),
        "window_tumbling": wrap(Q.q_window_tumbling),
        "asof_join": wrap(Q.q_asof_join),
        "topk_per_group": wrap(Q.q_topk_per_group),
        "distinct_count": wrap(Q.q_distinct_count),
        "quantiles": wrap(Q.q_quantiles),
        "quartile_stats": wrap(Q.q_quartile_stats),
        "set_ops": wrap(Q.q_set_ops),
        "editdist_join": wrap(Q.q_editdist_join),
        "tfidf": wrap(Q.q_tfidf),
        "sample_topk": wrap(Q.q_sample_topk),
        "sessionize": wrap(Q.q_sessionize),
        "window_analytics": wrap(Q.q_window_analytics),
        "semi_join": wrap(Q.q_semi_join),
        "anti_join": wrap(Q.q_anti_join),
        "range_join": wrap(Q.q_range_join),
        "rollup": wrap(Q.q_rollup),
        "pivot_wide": wrap(Q.q_pivot_wide),
        "window_sliding": wrap(Q.q_window_sliding),
        "bloom_join": wrap(Q.q_bloom_join),
        "regex_extract": wrap(Q.q_regex_extract),
        # flagship CSVW KG pipeline
        "kg_golden": _q_kg_golden,
        "kg_docs": _q_kg_docs,
        "kg_triples": _q_kg_triples,
        # invariants + training-data ops
        "doc_sha256": _q_doc_sha256,
        "exact_dedup": _q_exact_dedup,
        "token_count": _q_token_count,
        "text_stats": _q_text_stats,
        "quality_score": _q_quality,
        "lang_id": _q_lang_id,
        "stratified_sample": _q_stratified_sample,
        "top_ngrams": _q_top_ngrams,
        "approx_quantiles": _q_approx_quantiles,
        "quantiles_sketch": _q_quantiles_sketch,
        "distinct_count_hll": _q_distinct_count_hll,
        "distinct_count_hll_by": _q_distinct_count_hll_by,
        "fingerprint": _q_fingerprint,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "ngram_jaccard": _q_ngram_jaccard,
        "ngram_jaccard_exact": _q_ngram_jaccard_exact,
        "embedding_neardup": _q_embedding_neardup,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "ann_topk": _q_ann_topk,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "ann_topk_ivf_full": _q_ann_topk_ivf_full,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "multimodal_stub": _q_multimodal_stub,
        "audio_features": _q_audio_features,
        "video_frames": _q_video_frames,
        "image_decode": _q_image_decode,
    }


def oracle_sql() -> dict[str, str]:
    sqls = {
        "filter_scan": """
            SELECT event_id, user_id, value FROM events
            WHERE event_type = 'click' AND value >= 50.0
            ORDER BY event_id""",
        "groupby_agg": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   count(*) AS count_order,
                   round(sum(l_quantity) / count(*), 4) AS avg_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        "broadcast_join": """
            SELECT c_mktsegment, round(sum(o_totalprice), 4) AS segment_revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        "hash_join": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "dedup_first": """
            SELECT user_id, event_type, event_id, ts FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) AS rn
                FROM events) WHERE rn = 1
            ORDER BY user_id, event_type""",
        "sort_topk": """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
            LIMIT 100""",
        "window_tumbling": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY user_id, date_trunc('hour', ts)
            ORDER BY user_id, window_start""",
        "asof_join": """
            SELECT e.event_id, max(o.o_orderdate) AS last_order_date
            FROM events e LEFT JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            GROUP BY e.event_id ORDER BY e.event_id""",
        "semi_join": """
            SELECT o_orderpriority, count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS total_price
            FROM orders
            WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                                 WHERE l_quantity >= 48)
            GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "anti_join": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE c_custkey NOT IN (SELECT DISTINCT user_id FROM events)
            GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        "range_join": """
            SELECT a.event_id AS a_event_id, b.event_id AS b_event_id,
                   epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
            ORDER BY a_event_id, b_event_id""",
        "regex_extract": """
            SELECT event_type, count(*) AS n_high,
                   CAST(sum(k) AS BIGINT) AS sum_k
            FROM (SELECT event_type,
                         CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
                  FROM events)
            WHERE k >= 50 GROUP BY event_type ORDER BY event_type""",
        "bloom_join": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY o_orderpriority ORDER BY o_orderpriority""",
        "window_sliding": """
            WITH b AS (
              SELECT user_id, value,
                     CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800)
                          AS TIMESTAMP) AS b30
              FROM events),
            w AS (
              SELECT user_id, value, b30 AS window_start FROM b
              UNION ALL
              SELECT user_id, value, b30 - INTERVAL 30 MINUTE FROM b)
            SELECT user_id, window_start, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM w GROUP BY user_id, window_start
            ORDER BY user_id, window_start""",
        "rollup": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   count(*) AS n_rows
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus""",
        "pivot_wide": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_view,
                   round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 4)
                       AS click_value,
                   round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 4)
                       AS purchase_value
            FROM events GROUP BY user_id ORDER BY user_id""",
        # pure-SQL reconstruction of the CSVW conversion over the documents
        # corpus (table_corpus_rows: 100 rows/file, repo = shard % 4,
        # aboutUrl "docs/{doc_id}", default propertyUrl = tableUrl#name,
        # minimal mode -> one triple per non-null cell; integers carry the
        # xsd:integer datatype IRI, strings a plain literal, coalesced to
        # '' on both sides)
        "kg_triples": """
            WITH d AS (
              SELECT doc_id, text, lang, source, n_chars,
                     CAST((row_number() OVER (ORDER BY doc_id) - 1) // 100
                          AS BIGINT) AS shard
              FROM documents),
            u AS (
              SELECT doc_id, shard, 'doc_id' AS col,
                     CAST(doc_id AS VARCHAR) AS obj_value,
                     'http://www.w3.org/2001/XMLSchema#integer' AS obj_datatype
              FROM d
              UNION ALL
              SELECT doc_id, shard, 'lang', lang, '' FROM d
              UNION ALL
              SELECT doc_id, shard, 'n_chars', CAST(n_chars AS VARCHAR),
                     'http://www.w3.org/2001/XMLSchema#integer' FROM d
              UNION ALL
              SELECT doc_id, shard, 'source', source, '' FROM d
              UNION ALL
              SELECT doc_id, shard, 'text', text, '' FROM d)
            SELECT 'http://corpus.invalid/org0/data' || (shard % 4)
                       || '/docs/docs/' || doc_id AS subj,
                   'http://corpus.invalid/org0/data' || (shard % 4)
                       || '/docs/docs_' || lpad(CAST(shard AS VARCHAR), 4, '0')
                       || '.csv#' || col AS pred,
                   obj_value, obj_datatype
            FROM u ORDER BY subj, pred, obj_value""",
        "doc_sha256": """
            SELECT doc_id, sha256(text) AS content_sha256 FROM documents
            ORDER BY doc_id""",
        "exact_dedup": """
            SELECT min(doc_id) AS keep_id, count(*) AS n_dups
            FROM documents GROUP BY text ORDER BY keep_id""",
        "token_count": """
            SELECT lang,
                   CAST(sum(length(list_filter(regexp_split_to_array(text, '\\s+'),
                                               x -> x <> ''))) AS BIGINT)
                       AS total_ws_tokens,
                   count(*) AS n_docs
            FROM documents GROUP BY lang ORDER BY lang""",
        "text_stats": """
            SELECT doc_id, length(text) AS n_chars_calc,
                   length(regexp_replace(text, '[^.!?]', '', 'g')) AS n_sentences
            FROM documents ORDER BY doc_id""",
        # every-50th vector is re-emitted under vec_id+100000 with an
        # identical embedding (both sides plant the same rows): the raw
        # synthetic embeddings are near-orthogonal, so without planting
        # the comparison is vacuous (0 rows on both sides)
        "embedding_neardup": """
            WITH sub AS (
              SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0
              UNION ALL
              SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
              WHERE vec_id % 50 = 0)
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
            FROM sub a JOIN sub b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
            ORDER BY a, b""",
        "topk_per_group": """
            SELECT c_mktsegment, o_orderkey, o_totalprice, rank FROM (
                SELECT c_mktsegment, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey) AS rank
                FROM orders JOIN customer ON o_custkey = c_custkey)
            WHERE rank <= 3 ORDER BY c_mktsegment, rank""",
        "distinct_count": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type""",
        "quantiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
        # value-based quartile bucketing against exact quantile_cont
        # thresholds (deterministic under any row order, unlike NTILE's
        # positional tie-splitting); BIGINT casts for dtype parity
        "quartile_stats": """
            WITH t AS (
                SELECT l_returnflag,
                       quantile_cont(l_extendedprice, 0.25) AS q1,
                       quantile_cont(l_extendedprice, 0.50) AS q2,
                       quantile_cont(l_extendedprice, 0.75) AS q3
                FROM lineitem GROUP BY l_returnflag)
            SELECT l.l_returnflag,
                   CAST(CASE WHEN l_extendedprice <= q1 THEN 1
                             WHEN l_extendedprice <= q2 THEN 2
                             WHEN l_extendedprice <= q3 THEN 3
                             ELSE 4 END AS BIGINT) AS quartile,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(l_extendedprice), 4) AS sum_price
            FROM lineitem l JOIN t USING (l_returnflag)
            GROUP BY 1, 2 ORDER BY 1, 2""",
        # edit-distance<=1 similarity join on the 12-char text prefix:
        # the engine's deletion-neighborhood join must reproduce the
        # O(n^2) levenshtein join exactly (candidates are verified, so
        # the signature scheme can only add bandwidth, never pairs)
        "editdist_join": """
            WITH k AS (SELECT doc_id, lower(substr(text, 1, 12)) AS key
                       FROM documents WHERE text IS NOT NULL)
            SELECT a.doc_id AS a, b.doc_id AS b,
                   CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
            FROM k a JOIN k b
              ON a.doc_id < b.doc_id AND levenshtein(a.key, b.key) <= 1
            ORDER BY a, b""",
        # exact-k deterministic sample per language: the k smallest
        # md5(salt|doc_id) digests, tie-broken by doc_id -- the engine's
        # hash-order head must be bit-exact
        "sample_topk": """
            SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id FROM (
                SELECT lang, doc_id,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY md5('s0|' || CAST(doc_id AS VARCHAR)),
                                    doc_id) AS rn
                FROM documents) WHERE rn <= 10
            ORDER BY lang, rn, doc_id""",
        # TF-IDF top-5 terms per doc: tf * ln(N/df) rounded to 6dp,
        # term tie-break -- deterministic under any row order (both
        # engines tokenize with the same ASCII RE2-compatible pattern)
        "tfidf": """
            WITH tok2 AS (
                SELECT doc_id, term FROM (
                    SELECT doc_id,
                           unnest(string_split_regex(lower(text),
                                                     '[^0-9a-z_]+')) AS term
                    FROM documents WHERE text IS NOT NULL)
                WHERE term <> ''),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM tok2 GROUP BY 1, 2),
            dfreq AS (SELECT term, count(DISTINCT doc_id) AS df
                      FROM tok2 GROUP BY 1),
            n AS (SELECT count(DISTINCT doc_id) AS n FROM tok2),
            s AS (SELECT tf.doc_id, tf.term,
                         round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df),
                               6) AS score
                  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, term) AS rn FROM s)
            SELECT doc_id, term, score FROM r WHERE rn <= 5
            ORDER BY doc_id, term""",
        # INTERSECT / EXCEPT on user sets as one flag aggregation
        "set_ops": """
            WITH f AS (
                SELECT user_id,
                       max(CASE WHEN event_type = 'click'
                                THEN 1 ELSE 0 END) AS has_c,
                       max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS has_p
                FROM events
                WHERE event_type IN ('click', 'purchase')
                GROUP BY user_id)
            SELECT user_id,
                   CASE WHEN has_c = 1 AND has_p = 1 THEN 'both'
                        WHEN has_c = 1 THEN 'click_only'
                        ELSE 'purchase_only' END AS segment
            FROM f ORDER BY user_id""",
        "sessionize": """
            WITH d AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
                SELECT user_id, event_id, ts,
                       CAST(sum(new_s) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS BIGINT)
                           AS session_id
                FROM d)
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts) AS t_start, max(ts) AS t_end
            FROM s GROUP BY user_id, session_id
            ORDER BY user_id, session_id""",
        # running sum in integer CENTS (floor(value*100)): a float64
        # cumulative sum's low bits depend on accumulation order, which
        # would hash-diverge between engines on equal math
        "window_analytics": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(floor(value * 100) AS BIGINT)) OVER w
                        AS BIGINT) AS running_cents,
                   LAG(value) OVER w AS prev_value,
                   CAST(row_number() OVER w AS BIGINT) AS row_no
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id""",
        "ngram_jaccard_exact": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS t
              FROM documents),
            grams AS (
              SELECT doc_id,
                     CASE WHEN len(t) = 0 THEN []::VARCHAR[]
                          WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                          ELSE list_distinct(list_transform(
                              generate_series(1, len(t) - 2),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                     END AS g
              FROM toks),
            pairs AS (
              SELECT a.doc_id AS a, b.doc_id AS b,
                     CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 1.0
                          ELSE len(list_intersect(a.g, b.g)) * 1.0
                               / len(list_distinct(a.g || b.g))
                     END AS jaccard
              FROM grams a JOIN grams b ON a.doc_id < b.doc_id)
            SELECT a, b, round(jaccard, 4) AS jaccard
            FROM pairs WHERE jaccard >= 0.5 ORDER BY a, b""",
        "quality_score": """
            WITH w AS (
              SELECT doc_id,
                     coalesce(text, '') AS t,
                     regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS words
              FROM documents),
            m AS (
              SELECT doc_id,
                     len(words) AS n_words,
                     length(regexp_replace(t, '[^.!?]', '', 'g')) AS n_sentences,
                     len(list_filter(words, x -> list_contains(
                         ['the','and','of','to','a','in','is','it','that',
                          'for','was','on','are','with','as','this','be',
                          'at','have'], x))) AS n_stop,
                     coalesce(list_sum(list_transform(words, x -> len(x))), 0)
                         AS sum_wlen,
                     length(regexp_replace(t, '[^0-9]', '', 'g')) AS n_digits,
                     length(t) AS n_chars
              FROM w)
            SELECT doc_id, n_words, n_sentences,
                   CAST(n_stop * 1000 // greatest(n_words, 1) AS BIGINT)
                       AS stopword_permille,
                   CAST(sum_wlen * 100 // greatest(n_words, 1) AS BIGINT)
                       AS mean_wlen_centi,
                   CAST(n_digits * 1000 // greatest(n_chars, 1) AS BIGINT)
                       AS digit_permille
            FROM m ORDER BY doc_id""",
        # hash-sample twin: ('0x' || first-8-hex of md5(salt|key))::BIGINT
        # % 1000 is bit-exact with Python int(md5(...).hexdigest()[:8], 16)
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(('0x' || substr(md5('s0|' || doc_id), 1, 8)) AS BIGINT)
                  % 1000 < CASE WHEN lang = 'en' THEN 200 ELSE 500 END
            ORDER BY doc_id""",
        "top_ngrams": """
            WITH toks AS (
              SELECT regexp_extract_all(lower(coalesce(text, '')),
                                        '[0-9a-z_]+') AS t
              FROM documents),
            grams AS (
              SELECT unnest(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
              FROM toks WHERE len(t) >= 3)
            SELECT gram, count(*) AS n FROM grams GROUP BY gram
            ORDER BY n DESC, gram LIMIT 20""",
        # mirrors ops.text.LangId exactly: ASCII [a-z]+ tokens of the
        # lowercased text, score = stopword_hits/n_words (+0.05 char
        # hint), ties break alphabetically, <= 0.02 or no words -> 'und'.
        # Double arithmetic is identical on both engines (one division,
        # one addition), and the compared output is integer counts.
        "lang_id": """
            WITH w AS (
              SELECT doc_id, coalesce(text, '') AS t,
                     regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')
                         AS words
              FROM documents),
            m AS (
              SELECT doc_id, t, len(words) AS nw,
                len(list_filter(words, x -> list_contains(
                    ['the','and','of','to','a','in','is','it','that','for',
                     'was','on','are','with','as','this','be','at','have'],
                    x))) AS h_en,
                len(list_filter(words, x -> list_contains(
                    ['der','die','das','und','ist','ich','nicht','ein',
                     'eine','mit','auf','für','den','von','zu','im','sich'],
                    x))) AS h_de,
                len(list_filter(words, x -> list_contains(
                    ['le','la','les','et','est','un','une','des','du','que',
                     'qui','dans','pour','pas','sur','avec','au'],
                    x))) AS h_fr,
                len(list_filter(words, x -> list_contains(
                    ['el','la','los','las','y','es','un','una','de','que',
                     'en','no','se','por','con','para','su'],
                    x))) AS h_es,
                len(list_filter(words, x -> list_contains(
                    ['il','la','le','e','è','un','una','di','che','non',
                     'per','con','del','si','sono','come'],
                    x))) AS h_it
              FROM w),
            s AS (
              SELECT doc_id, nw, l.lang,
                CASE l.lang
                  WHEN 'de' THEN h_de * 1.0 / greatest(nw, 1)
                       + CASE WHEN regexp_matches(t, '[äöüß]')
                              THEN 0.05 ELSE 0.0 END
                  WHEN 'en' THEN h_en * 1.0 / greatest(nw, 1)
                  WHEN 'es' THEN h_es * 1.0 / greatest(nw, 1)
                       + CASE WHEN regexp_matches(t, '[áéíóúñ¿¡]')
                              THEN 0.05 ELSE 0.0 END
                  WHEN 'fr' THEN h_fr * 1.0 / greatest(nw, 1)
                       + CASE WHEN regexp_matches(t, '[àâçéèêëîïôûù]')
                              THEN 0.05 ELSE 0.0 END
                  WHEN 'it' THEN h_it * 1.0 / greatest(nw, 1)
                       + CASE WHEN regexp_matches(t, '[àèéìòù]')
                              THEN 0.05 ELSE 0.0 END
                END AS score
              FROM m, (VALUES ('de'), ('en'), ('es'), ('fr'), ('it')) l(lang)),
            b AS (
              SELECT doc_id, nw, lang, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, lang) AS rn
              FROM s),
            p AS (
              SELECT CASE WHEN nw = 0 OR score <= 0.02 THEN 'und'
                          ELSE lang END AS lang_pred
              FROM b WHERE rn = 1)
            SELECT lang_pred, count(*) AS n_docs FROM p
            GROUP BY lang_pred ORDER BY lang_pred""",
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 4),
                 scored AS (
                   SELECT q.query_id, e.vec_id,
                          list_cosine_similarity(q.qe, e.embedding) AS raw_score,
                          row_number() OVER (
                              PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                                       e.vec_id) AS rn
                   FROM q CROSS JOIN embeddings e)
            -- CAST to DOUBLE first: DuckDB round() on a FLOAT returns
            -- FLOAT, whose nearest-float32 0.277 != the engine's float64
            -- 0.277 at the 1e-8 level (dtype-exact compare parity)
            SELECT query_id, vec_id, round(CAST(raw_score AS DOUBLE), 3) AS score
            FROM scored WHERE rn <= 10
            ORDER BY query_id, score DESC, vec_id""",
        # The engine recovers each tone's filter band through a real WAV
        # decode + rfft filter bank; the planted band is a pure function
        # of doc_id, so SQL can state the expected answer exactly.
        "audio_features": """
            SELECT doc_id, CAST(doc_id % 14 + 1 AS BIGINT) AS peak_band
            FROM documents ORDER BY doc_id""",
        # The engine recovers each frame's gray level through a real Y4M
        # decode (header/FRAME parse, YUV planes, BT.601, resize); the
        # planted level is a pure function of (doc_id, frame_no).
        # (fixed series + filter, not a lateral generate_series(0, expr):
        # this DuckDB build rejects lateral column parameters there)
        "video_frames": """
            SELECT d.doc_id, CAST(t.f AS INTEGER) AS frame_no,
                   CAST((d.doc_id * 31 + t.f * 17) % 256 AS BIGINT) AS gray
            FROM documents d
            CROSS JOIN (SELECT unnest(range(0, 7)) AS f) t
            WHERE t.f <= d.doc_id % 7
            ORDER BY d.doc_id, t.f""",
        # The engine recovers each solid JPEG's gray level through a real
        # baseline decode (huffman, dequant, IDCT, chroma upsampling,
        # YCbCr->RGB); the planted level is a pure function of doc_id and
        # the q=100 decode is exact by construction (all-ones quant
        # tables, DC-only solid blocks).
        "image_decode": """
            SELECT doc_id, CAST(doc_id * 37 % 256 AS BIGINT) AS gray
            FROM documents ORDER BY doc_id""",
    }
    # IVF with nprobe == num_centroids is exact brute force: same oracle
    sqls["ann_topk_ivf_full"] = sqls["ann_topk"]
    return sqls
