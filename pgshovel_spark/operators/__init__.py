"""Composite operators Spark lacks natively, built from DataFrame ops."""

from pgshovel_spark.operators.asof import asof_join
from pgshovel_spark.operators.topk import topk_global, topk_per_group

__all__ = ["asof_join", "topk_global", "topk_per_group"]
