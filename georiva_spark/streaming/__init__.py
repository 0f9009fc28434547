from georiva_spark.streaming.ingest import (
    grid_file_stream, start_grid_ingest, run_sweep_now,
)
from georiva_spark.streaming.windows import windowed_stats

__all__ = ["grid_file_stream", "start_grid_ingest", "run_sweep_now",
           "windowed_stats"]
