from graphkb_spark.plans.filter_dsl import compile_filters, run_query

__all__ = ["compile_filters", "run_query"]
