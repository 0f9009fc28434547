from georiva_spark.functions.scalars import (
    safe_divide, vector_magnitude, vector_direction, unit_conversion_expr,
    rescale_255, normalize_lon,
)

__all__ = ["safe_divide", "vector_magnitude", "vector_direction",
           "unit_conversion_expr", "rescale_255", "normalize_lon"]
