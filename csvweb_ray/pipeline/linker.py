"""G4 — mention detection + entity-link scoring as an actor-pool stage.

The north-star pipeline scores literal mentions in the emitted triples
against a **shared IRI dictionary**.  The dictionary is built once from
the minted subject IRIs (label = the IRI's trailing path/fragment
segment), put in the object store with ``ray.put`` on the driver, and
read zero-copy by each actor in ``__init__`` — it is never re-shipped per
batch (the broadcast-small-side pattern; SURVEY.md §2.7 G4).

Scale assumption (documented): the entity dictionary is vocabulary-sized
and fits in a worker heap; ``max_entries`` caps it defensively.  At a
scale where it does not fit, the right design is a hash-partitioned
bucket join instead — the dictionary build below already pre-aggregates
per batch so only distinct (label, iri) pairs reach the driver.
"""

from __future__ import annotations

import re
import urllib.parse

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["build_iri_dictionary", "build_iri_pairs", "EntityLinker",
           "link_triples", "link_triples_bucketed"]

#: Predicate minted for accepted links (our own vocab; the reference has
#: no linking stage — this is graft-added semantics).
LINK_PRED = "http://corpus.invalid/vocab#linksTo"

_WS = re.compile(r"\s+")


def _pack_pair(label: str, iri: str) -> str:
    """Sortable packed (label, iri) — the deterministic tie-break key used
    by BOTH linking paths (broadcast and bucketed) so they agree on the
    token-set winner.  The label is control-char-escaped so the packed
    string splits back unambiguously."""
    esc = label.replace("\x1e", "\x1eE").replace("\x1f", "\x1eF")
    return f"{esc}\x1f{iri}"


def _unpack_iri(packed: str) -> str:
    return packed.split("\x1f", 1)[1]


def _token_key(norm: str) -> str:
    return " ".join(sorted(set(norm.split())))


def _label_of_iri(iri: str) -> str | None:
    """Human label candidate from an IRI: last fragment / path segment,
    percent-decoded, word-normalized."""
    tail = iri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    if not tail:
        return None
    label = urllib.parse.unquote(tail).replace("_", " ").replace("-", " ")
    label = _WS.sub(" ", label).strip().casefold()
    return label or None


def build_iri_pairs(triples_ds):
    """Distinct (label → min IRI) pairs as a Dataset — the scale-bearing
    form of the dictionary (never collected to the driver).

    Per-batch partial dedup (the combiner) → ``groupby(label)`` keeping the
    smallest IRI (deterministic).  Only the already-distinct (label, iri)
    pairs cross the shuffle.  A per-group UDF here would cost one Python
    call per distinct label; the Min aggregate is native."""
    from ray.data.aggregate import Min

    def _extract(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.equal(batch["subj_kind"], "i"))
        labels, iris = [], []
        for iri in pc.unique(sub["subj"]).to_pylist():
            label = _label_of_iri(iri)
            if label:
                labels.append(label)
                iris.append(iri)
        return pa.table({"label": pa.array(labels, type=pa.string()),
                         "iri": pa.array(iris, type=pa.string())})

    return (triples_ds.map_batches(_extract, batch_format="pyarrow")
            .groupby("label").aggregate(Min("iri", alias_name="iri")))


def build_iri_dictionary(triples_ds, max_entries: int = 1_000_000) -> dict | None:
    """label → IRI driver dict for the broadcast path, or **None** when the
    dictionary exceeds ``max_entries`` — the caller must then use the
    hash-partitioned ``link_triples_bucketed`` fallback instead of a
    silently-truncated (wrong) dictionary."""
    pairs = build_iri_pairs(triples_ds)
    out: dict[str, str] = {}
    for batch in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for label, iri in zip(batch["label"].to_pylist(), batch["iri"].to_pylist()):
            if len(out) >= max_entries:
                return None
            out.setdefault(label, iri)
    return out


class EntityLinker:
    """Callable class → Ray actor pool: dictionary fetched ONCE per actor
    in ``__init__`` (zero-copy ``ray.get`` of the broadcast ref), batches
    scored in ``__call__``.

    Scoring: a string-literal object whose normalized text equals a
    dictionary label links with score 1.0; a literal whose token *set*
    equals a label's token set links 0.8 (mention detection by token
    identity — deterministic, no model).  Emits ``link_iri`` /
    ``link_score`` columns; ``as_triples=True`` additionally rewrites
    accepted links into ``linksTo`` triples.
    """

    def __init__(self, dict_ref):
        import ray

        self.lookup: dict[str, str] = (
            ray.get(dict_ref) if not isinstance(dict_ref, dict) else dict_ref)
        self.token_lookup = {}
        for label, iri in self.lookup.items():
            key = _token_key(label)
            cur = self.token_lookup.get(key)
            # deterministic winner per token set: min packed (label, iri)
            # — dict iteration order must not leak into the output, and
            # the rule must match link_triples_bucketed exactly
            packed = _pack_pair(label, iri)
            if cur is None or packed < cur:
                self.token_lookup[key] = packed
        self.ws = _WS

    def _score_one(self, value: str) -> tuple[str | None, float]:
        norm = self.ws.sub(" ", value).strip().casefold()
        if not norm:
            return None, 0.0
        hit = self.lookup.get(norm)
        if hit:
            return hit, 1.0
        tok = self.token_lookup.get(_token_key(norm))
        if tok:
            return _unpack_iri(tok), 0.8
        return None, 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        # NB: pyarrow's and_/or_ are non-Kleene (True OR null = null), and
        # an all-null obj_datatype column reads back as null-typed — build
        # the mask in Python over the (small) per-batch lists
        kinds = batch["obj_kind"].to_pylist()
        dts = batch["obj_datatype"].to_pylist()
        xsd_string = "http://www.w3.org/2001/XMLSchema#string"
        mask = [k == "l" and (d is None or d == xsd_string)
                for k, d in zip(kinds, dts)]
        values = batch["obj_value"].to_pylist()
        # memoize per distinct value within the batch
        cache: dict[str, tuple[str | None, float]] = {}
        link_iri, link_score = [], []
        for keep, v in zip(mask, values):
            if not keep or v is None:
                link_iri.append(None)
                link_score.append(None)
                continue
            if v not in cache:
                cache[v] = self._score_one(v)
            iri, score = cache[v]
            link_iri.append(iri)
            link_score.append(score if iri else None)
        batch = batch.append_column("link_iri", pa.array(link_iri, type=pa.string()))
        return batch.append_column("link_score", pa.array(link_score, type=pa.float64()))


def default_pool_size() -> int:
    """Actor-pool size that leaves CPUs for the read/shuffle/write stages
    (a pool reserving every CPU deadlocks the streaming executor — the
    pipeline's other stages can never schedule)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(16, cpus // 2))


def link_triples(ds, dict_ref, concurrency: int | None = None,
                 batch_size: int = 4096, num_cpus: float = 1):
    """Attach the linker actor pool to a triples dataset."""
    if concurrency is None:
        concurrency = default_pool_size()
    return ds.map_batches(
        EntityLinker, fn_constructor_args=(dict_ref,),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)


def links_as_triples(ds):
    """Accepted links (score ≥ 0.8) → ``(subj, linksTo, link_iri)`` triple
    rows appended to the stream, lineage preserved."""

    def _emit(batch: pa.Table) -> pa.Table:
        accepted = batch.filter(pc.and_(pc.is_valid(batch["link_iri"]),
                                        pc.greater_equal(batch["link_score"], 0.8)))
        if accepted.num_rows == 0:
            return batch
        n = accepted.num_rows

        def typed(name: str, values=None):
            # mirror the incoming block's field type exactly (all-null
            # columns round-trip as null-typed; concat requires equality)
            ftype = batch.schema.field(name).type
            if values is None:
                return pa.nulls(n, type=ftype)
            return pa.array(values, type=None).cast(ftype) \
                if not pa.types.is_null(ftype) else pa.nulls(n, type=ftype)

        extra = {
            "subj_kind": accepted["subj_kind"],
            "subj": accepted["subj"],
            "pred": typed("pred", [LINK_PRED] * n),
            "obj_kind": typed("obj_kind", ["i"] * n),
            "obj_value": accepted["link_iri"].combine_chunks().cast(
                batch.schema.field("obj_value").type),
            "obj_datatype": typed("obj_datatype"),
            "obj_lang": typed("obj_lang"),
            "repo": accepted["repo"], "path": accepted["path"],
            "commit": accepted["commit"],
            "content_sha256": accepted["content_sha256"],
            "link_iri": typed("link_iri"),
            "link_score": typed("link_score"),
        }
        extra_tbl = pa.Table.from_pydict(
            {k: extra[k] for k in batch.column_names})
        return pa.concat_tables([batch, extra_tbl])

    return ds.map_batches(_emit, batch_format="pyarrow")


def link_triples_bucketed(ds, pairs_ds, num_buckets: int = 64):
    """G4 fallback when the IRI dictionary exceeds the broadcast cap: a
    hash-partitioned bucket join on the normalized label instead of a
    driver dict.  Returns a Dataset of ``linksTo`` TRIPLE rows (same
    columns as the input triple stream) to union with it before dedup.

    Shape: the dictionary side emits one row per (label → exact key) and
    one per (token-set key, pre-reduced to the min packed (label, iri) by
    a native aggregate); the triple side emits one slim row per linkable
    literal per key kind.  Both sides hash their key into ``num_buckets``
    buckets, one pandas merge per bucket, then a native-aggregate reduce
    per source row prefers the exact match (score 1.0) over the token
    match (0.8) — identical semantics to ``EntityLinker``.
    """
    import zlib

    import pandas as pd
    from ray.data.aggregate import Max, Min

    xsd_string = "http://www.w3.org/2001/XMLSchema#string"

    def _bucket_of(key: str) -> int:
        return zlib.crc32(key.encode()) % num_buckets

    _QCOLS = ["bucket", "side", "match_key", "score", "iri", "rowkey",
              "subj_kind", "subj", "repo", "path", "commit", "content_sha256"]

    def _dict_exact(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_pylist()
        iris = batch["iri"].to_pylist()
        out = {c: [] for c in _QCOLS}
        for label, iri in zip(labels, iris):
            out["bucket"].append(_bucket_of(label))
            out["side"].append("d")
            out["match_key"].append(label)
            out["score"].append("1.0")
            out["iri"].append(iri)
            for c in _QCOLS[5:]:
                out[c].append(None)
        return _qtable(out)

    def _dict_token_pack(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_pylist()
        iris = batch["iri"].to_pylist()
        return pa.table({
            "tok": pa.array([_token_key(l) for l in labels], type=pa.string()),
            "packed": pa.array([_pack_pair(l, i) for l, i in zip(labels, iris)],
                               type=pa.string())})

    def _dict_token_rows(batch: pa.Table) -> pa.Table:
        out = {c: [] for c in _QCOLS}
        for tok, packed in zip(batch["tok"].to_pylist(),
                               batch["packed"].to_pylist()):
            out["bucket"].append(_bucket_of(tok))
            out["side"].append("d")
            out["match_key"].append(tok)
            out["score"].append("0.8")
            out["iri"].append(_unpack_iri(packed))
            for c in _QCOLS[5:]:
                out[c].append(None)
        return _qtable(out)

    def _qtable(out: dict) -> pa.Table:
        return pa.table({c: pa.array(out[c],
                                     type=pa.int32() if c == "bucket" else pa.string())
                         for c in _QCOLS})

    def _query_rows(batch: pa.Table) -> pa.Table:
        import hashlib

        kinds = batch["obj_kind"].to_pylist()
        dts = batch["obj_datatype"].to_pylist()
        values = batch["obj_value"].to_pylist()
        carry = {c: batch[c].to_pylist()
                 for c in ("subj_kind", "subj", "pred", "repo", "path",
                           "commit", "content_sha256", "obj_lang")}
        out = {c: [] for c in _QCOLS}
        for i, (k, d, v) in enumerate(zip(kinds, dts, values)):
            if k != "l" or v is None or not (d is None or d == xsd_string):
                continue
            norm = _WS.sub(" ", v).strip().casefold()
            if not norm:
                continue
            rowkey = hashlib.sha256("\x1f".join(
                (carry["subj_kind"][i] or "", carry["subj"][i] or "",
                 carry["pred"][i] or "", v, carry["repo"][i] or "",
                 carry["path"][i] or "", carry["commit"][i] or "")
            ).encode()).hexdigest()
            for key, score in ((norm, "1.0"), (_token_key(norm), "0.8")):
                out["bucket"].append(_bucket_of(key))
                out["side"].append("q")
                out["match_key"].append(key)
                out["score"].append(score)
                out["iri"].append(None)
                out["rowkey"].append(rowkey)
                for c in ("subj_kind", "subj", "repo", "path", "commit",
                          "content_sha256"):
                    out[c].append(carry[c][i])
        return _qtable(out)

    def _match(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == "d"].reindex(columns=["match_key", "score", "iri"])
        q = g[g["side"] == "q"].reindex(
            columns=["match_key", "score", "rowkey", "subj_kind", "subj",
                     "repo", "path", "commit", "content_sha256"])
        if d.empty or q.empty:
            return pd.DataFrame(columns=["rowkey", "subj_kind", "subj", "repo",
                                         "path", "commit", "content_sha256",
                                         "packed"])
        m = q.merge(d, on=["match_key", "score"])
        if m.empty:
            return pd.DataFrame(columns=["rowkey", "subj_kind", "subj", "repo",
                                         "path", "commit", "content_sha256",
                                         "packed"])
        m["packed"] = m["score"] + "\x1f" + m["iri"]
        return m[["rowkey", "subj_kind", "subj", "repo", "path", "commit",
                  "content_sha256", "packed"]]

    dict_exact = pairs_ds.map_batches(_dict_exact, batch_format="pyarrow")
    dict_token = (pairs_ds.map_batches(_dict_token_pack, batch_format="pyarrow")
                  .groupby("tok").aggregate(Min("packed", alias_name="packed"))
                  .map_batches(_dict_token_rows, batch_format="pyarrow"))
    queries = ds.map_batches(_query_rows, batch_format="pyarrow")

    matched = (queries.union(dict_exact).union(dict_token)
               .groupby("bucket").map_groups(_match, batch_format="pandas"))
    # one link per source row: the exact match ("1.0"|iri) sorts above the
    # token match ("0.8"|iri) — a native Max, no per-row UDF
    best = matched.groupby(
        ["rowkey", "subj_kind", "subj", "repo", "path", "commit",
         "content_sha256"]).aggregate(Max("packed", alias_name="packed"))

    def _emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        iris = [p.split("\x1f", 1)[1] for p in batch["packed"].to_pylist()]
        return pa.table({
            "subj_kind": batch["subj_kind"],
            "subj": batch["subj"],
            "pred": pa.array([LINK_PRED] * n, type=pa.string()),
            "obj_kind": pa.array(["i"] * n, type=pa.string()),
            "obj_value": pa.array(iris, type=pa.string()),
            "obj_datatype": pa.nulls(n, type=pa.string()),
            "obj_lang": pa.nulls(n, type=pa.string()),
            "repo": batch["repo"], "path": batch["path"],
            "commit": batch["commit"],
            "content_sha256": batch["content_sha256"],
        })

    return best.map_batches(_emit, batch_format="pyarrow")
