"""pystreams — a PySpark-native analytics engine with the query and
data-processing capabilities of fgrzl/streams (see SURVEY.md)."""

from streams_spark.session import get_spark
from streams_spark.registry import REGISTRY, load_all

__all__ = ["get_spark", "REGISTRY", "load_all"]
__version__ = "0.1.0"
