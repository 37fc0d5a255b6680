"""Composite operators Spark lacks natively, built from DataFrame ops."""

from pgshovel_spark.operators.ann import build_ivf_index, ivf_search
from pgshovel_spark.operators.asof import asof_join
from pgshovel_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    extract_media_features,
    sample_frames,
)
from pgshovel_spark.operators.rank import global_ntile, with_global_rank
from pgshovel_spark.operators.skew import salted_agg
from pgshovel_spark.operators.topk import topk_global, topk_per_group

__all__ = [
    "asof_join",
    "build_ivf_index",
    "ivf_search",
    "decode_audio",
    "decode_image",
    "extract_media_features",
    "global_ntile",
    "sample_frames",
    "with_global_rank",
    "salted_agg",
    "topk_global",
    "topk_per_group",
]
