from georiva_spark.streaming.ingest import (
    grid_file_stream, start_grid_ingest, run_sweep_now,
    start_corpus_ingest, start_corpus_deliveries,
    write_delivery_manifest,
)
from georiva_spark.streaming.windows import windowed_stats
from georiva_spark.streaming.dedupe import dedup_stream
from georiva_spark.streaming.neardup import (
    start_neardup_stream, read_neardup_pairs,
)
from georiva_spark.streaming.annstream import (
    start_ann_stream, read_ann_neighbors,
)
from georiva_spark.streaming.corpus import (
    start_corpus_stream, read_corpus_stream,
)
from georiva_spark.streaming.mediadup import (
    start_mediadup_stream, read_mediadup_pairs, read_mediadup_lookup,
)

__all__ = ["grid_file_stream", "start_grid_ingest", "run_sweep_now",
           "start_corpus_ingest", "start_corpus_deliveries",
           "write_delivery_manifest",
           "windowed_stats", "dedup_stream", "start_neardup_stream",
           "read_neardup_pairs", "start_ann_stream",
           "read_ann_neighbors", "start_corpus_stream",
           "read_corpus_stream", "start_mediadup_stream",
           "read_mediadup_pairs", "read_mediadup_lookup"]
