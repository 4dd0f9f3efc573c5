from biodata_pipeline_spark.plans.inspect import (
    formatted_plan,
    count_shuffles,
    has_pushed_filters,
)

__all__ = ["formatted_plan", "count_shuffles", "has_pushed_filters"]
