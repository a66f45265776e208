from scipi_spark.functions.text import (
    validate_str,
    validate_topics,
    validate_str_py,
    validate_topics_py,
)

__all__ = ["validate_str", "validate_topics", "validate_str_py", "validate_topics_py"]
