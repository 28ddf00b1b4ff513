"""Incremental near-duplicate detection: streaming MinHash + banded LSH.

The streaming member of the near-dup family (operators/dedup.py): as
crawl shards land, each new document is checked against everything
ALREADY SEEN that shares an LSH bucket with it, and qualifying pairs
are emitted immediately — no nightly backfill join over the full
corpus.  This is the operator a 100 TB/day ingest actually needs:
the batch LSH join recomputes all-pairs-within-buckets from scratch
each run, while this maintains the buckets as state and does only the
new-vs-seen comparisons per micro-batch.

Plan shape per micro-batch:

1. signature: per-ROW MinHash expression
   (``minhash_signature_column`` — shared with batch so signatures can
   never drift); map-only, no shuffle, because a document arrives whole.
2. banding: the SAME band-hash expression as the batch plan → posexplode
   to (band_id, band_hash) keys; one row per document per band.
3. bucket state: ``applyInPandasWithState`` keyed by (band_id,
   band_hash).  State = the bucket's (doc_id, signature) list.  Each
   arriving document compares against the stored signatures
   (est = matching positions / NUM_HASHES, threshold
   ``JACCARD_THRESHOLD``), emits qualifying pairs, then joins the
   bucket.

State lifetime: this module uses NO state timeout — the documents
stream carries no event time, and registering processing-time timers
makes ``availableNow`` drains spin empty batches until the timers
fire (observed; the trigger cannot terminate while timers are
pending).  State therefore grows with the distinct-bucket count.  A
production deployment feeding (doc, ingest_ts) should watermark on
ingest_ts and switch the operator to EventTimeTimeout eviction — the
state-transition code is timeout-agnostic, only the ``timeoutConf``
and a ``setTimeoutTimestamp`` call change (see
``streaming_dedup_first_seen`` for the event-time TTL pattern).

Emission contract: AT-LEAST-ONCE per pair — a pair sharing k bands is
emitted up to k times (and re-emitted if a document re-arrives).
Downstream consumers dedupe with ``dropDuplicates(doc_a, doc_b)``
(batch sink) or a keyed stateful dedup (streaming sink) — deliberately
NOT fused in here, because the right dedup scope (per-day? global?)
belongs to the consumer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from mini_hadoop_spark.operators.dedup import (
    BANDS,
    JACCARD_THRESHOLD,
    NUM_HASHES,
    ROWS_PER_BAND,
    minhash_signature_column,
)
from mini_hadoop_spark.functions.text import shingles, tokens

PAIRS_SCHEMA = StructType(
    [
        StructField("doc_a", LongType()),
        StructField("doc_b", LongType()),
        StructField("est_jaccard", DoubleType()),
    ]
)

_BUCKET_STATE_SCHEMA = StructType(
    [
        StructField("doc_ids", ArrayType(LongType())),
        StructField("sigs_flat", ArrayType(LongType())),  # len = len(doc_ids) * NUM_HASHES
    ]
)


def banded_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, sig, band_id, band_hash) per document per band — the
    batch plan's band-key expression over per-row signatures.  Documents
    with fewer than 3 tokens have no shingles, hence no signature, hence
    no bucket (exactly like the batch explode dropping them)."""
    sigs = (
        docs.select("doc_id", tokens("text").alias("t"))
        .select("doc_id", shingles("t").alias("shg"))
        .filter(F.size("shg") > 0)
        .select("doc_id", minhash_signature_column("shg").alias("sig"))
        # MATERIALIZATION BARRIER — load-bearing: the band expression
        # below references `sig` 64 times, and CollapseProject would
        # inline the whole signature computation into every reference
        # (64x recompute per document; measured minutes-vs-seconds).
        # The batch plan gets this barrier for free from its groupBy
        # aggregation; here an explicit exchange on doc_id pins `sig`
        # to one evaluation.  The state operator shuffles to
        # (band_id, band_hash) right after, so this adds one small
        # extra hop per micro-batch, not a new shuffle of the corpus.
        .repartition(F.col("doc_id"))
    )
    band_hashes = F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[F.col("sig").getItem(b * ROWS_PER_BAND + r) for r in range(ROWS_PER_BAND)],
            )
            for b in range(BANDS)
        ]
    )
    return sigs.select(
        "doc_id", "sig", F.posexplode(band_hashes).alias("band_id", "band_hash")
    )


def _bucket_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-bucket state transition (Arrow-batched).

    Compares each arriving document against the bucket's stored
    signatures, emits qualifying (doc_a < doc_b) pairs, adds the
    document to the bucket.  A re-arriving doc_id is compared but not
    re-added.  O(new x stored) signature compares per batch — bucket
    sizes are the E[N / 2^bits-ish] LSH population, not the corpus."""
    doc_ids, sigs_flat = state.get if state.exists else ([], [])
    doc_ids = list(doc_ids)
    sigs = [
        list(sigs_flat[i * NUM_HASHES:(i + 1) * NUM_HASHES]) for i in range(len(doc_ids))
    ]
    out = []
    for pdf in pdfs:
        for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
            doc_id = int(doc_id)
            sig = [int(x) for x in sig]
            for od, osig in zip(doc_ids, sigs):
                if od == doc_id:
                    break
                matches = sum(1 for x, y in zip(sig, osig) if x == y)
                est = matches / NUM_HASHES
                if est >= JACCARD_THRESHOLD:
                    a, b = (od, doc_id) if od < doc_id else (doc_id, od)
                    # round-half-up to 6, matching the batch operator
                    out.append((a, b, int(est * 1e6 + 0.5) / 1e6))
            else:
                doc_ids.append(doc_id)
                sigs.append(sig)
    state.update((doc_ids, [x for s in sigs for x in s]))
    if out:
        yield pd.DataFrame(out, columns=["doc_a", "doc_b", "est_jaccard"])


def streaming_near_dup_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pairs, incrementally, from a documents stream
    (or a batch frame — the plan is valid for both).  See module
    docstring for the at-least-once emission contract."""
    return banded_signatures(docs).groupBy("band_id", "band_hash").applyInPandasWithState(
        _bucket_fn,
        outputStructType=PAIRS_SCHEMA,
        stateStructType=_BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
