from georiva_spark.streaming.ingest import (
    grid_file_stream, start_grid_ingest, run_sweep_now,
)

__all__ = ["grid_file_stream", "start_grid_ingest", "run_sweep_now"]
