"""honas_spark — a PySpark-native distributed sketch/approximate-aggregation
engine with the query and data-processing capabilities of SURFnet/honas,
re-designed Spark-first (see SURVEY.md)."""

from .spec import SketchSpec
from .state import SketchState

__all__ = ["SketchSpec", "SketchState"]
__version__ = "0.1.0"
