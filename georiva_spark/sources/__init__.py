from georiva_spark.sources.tables import load_table, load_tables
from georiva_spark.sources.synthetic import events_grid, GRID_H, GRID_W, LAT0, LON0, RES

__all__ = ["load_table", "load_tables", "events_grid",
           "GRID_H", "GRID_W", "LAT0", "LON0", "RES"]
