"""Streaming takedown requests (r13): a landing directory receives
takedown-request files — one JSON object per line, ``{"request_id":
..., "ids": [...]}`` — and each micro-batch applies every new request
to the configured surfaces through
:func:`georiva_spark.plans.takedown.takedown`.

Why a stream: takedown requests arrive continuously in a production
corpus pipeline (legal queues batch them hourly/daily) and the
serving indexes must stop matching WITHIN the stream's latency, not
at the next manual maintenance window. The tombstone design makes the
per-request cost O(rule rows), so the stream stays cheap no matter
how big the indexes are; the physical purge rides the probe-then-grow
loops' pending-rule compaction cadence (streaming/_loop.py) or the
next explicit compaction.

Replay contract (at-least-once foreachBatch made idempotent, the same
commit-witness ordering as every launcher here): the AUDIT TOKEN is
the guard. ``takedown()`` commits ``{audit_dir}/takedown-{digest}.json``
LAST, after every leg completed — so a replayed batch reads the token
(through the commit backend: works on a pointer/object-store
``audit_dir`` too) and skips the request entirely; a crash mid-apply
leaves no token and the replay re-runs every leg, each of which is
individually idempotent (rules accumulate harmlessly, the token
rewrite finds the remainder, the corpus leg recovers from its intent
token). Requests keyed by id-set digest: a REDELIVERED request file
(same ids, new file) is a structural no-op.

A request with an EMPTY id list fails the batch by name (same
operator-intervention posture as the ingest stream's recrawl=reject:
a malformed legal artifact must never be silently dropped).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from georiva_spark.plans.takedown import request_digest, takedown
from georiva_spark.sources.commit import read_token_json

REQUEST_SCHEMA = "request_id string, ids array<long>"


def start_takedown_stream(spark: SparkSession, request_dir: str,
                          checkpoint_dir: str, audit_dir: str, *,
                          minhash_indexes=(), ivf_indexes=(),
                          hamming_indexes=(), token_layouts=(),
                          corpus: tuple | None = None,
                          hold_table: str | None = None,
                          max_files_per_trigger: int = 16,
                          available_now: bool = False
                          ) -> StreamingQuery:
    """Start the takedown-request stream; returns the StreamingQuery.
    ``audit_dir`` is REQUIRED here (it is the replay guard, not just
    the record). Surface kwargs are forwarded to
    :func:`~georiva_spark.plans.takedown.takedown` per request.

    Requests inside one micro-batch apply in sorted (request_id,
    digest) order — deterministic across replays. The request frame
    is collected driver-side: a request is a bounded human/legal
    artifact (an id list), never corpus-proportional, the same bound
    the rule tables themselves rely on."""
    minhash_indexes = tuple(minhash_indexes)
    ivf_indexes = tuple(ivf_indexes)
    hamming_indexes = tuple(hamming_indexes)
    token_layouts = tuple(token_layouts)
    if (len(minhash_indexes) + len(ivf_indexes) + len(hamming_indexes)
            + len(token_layouts) + (1 if corpus is not None else 0)
            + (1 if hold_table is not None else 0) == 0):
        raise ValueError(
            "start_takedown_stream: no surfaces named — pass at "
            "least one of minhash_indexes/ivf_indexes/"
            "hamming_indexes/token_layouts/corpus/hold_table")

    stream = (spark.readStream.schema(REQUEST_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .json(request_dir))

    def process(batch, batch_id: int) -> None:
        reqs = batch.collect()
        for r in sorted(reqs, key=lambda r: (r.request_id or "",)):
            if not r.ids:
                raise ValueError(
                    f"start_takedown_stream: request "
                    f"{r.request_id!r} carries an empty id list — a "
                    f"malformed takedown artifact must not be "
                    f"silently dropped; remove or fix the file")
            digest = request_digest(r.ids)
            guard = f"{audit_dir}/takedown-{digest}.json"
            if read_token_json(guard,
                               who="start_takedown_stream") is not None:
                continue  # replay or redelivered request: applied
            # the SERVING session, not the batch's clone: every leg
            # touches catalog tables whose relation caches live there
            takedown(spark, list(r.ids),
                     minhash_indexes=minhash_indexes,
                     ivf_indexes=ivf_indexes,
                     hamming_indexes=hamming_indexes,
                     token_layouts=token_layouts,
                     corpus=corpus, hold_table=hold_table,
                     audit_dir=audit_dir)

    writer = stream.writeStream.foreachBatch(process) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
